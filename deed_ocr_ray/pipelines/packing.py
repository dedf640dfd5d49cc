"""Sequence packing + distributed prefix sum + iterative clustering.

Training-data operators built on patterns Ray Data has no primitive for:

* ``q_pack_windows`` — greedy contiguous packing of documents into
  fixed-size token windows, i.e. a GLOBAL running sum. Implemented as
  the classic two-pass distributed prefix sum: (1) one cheap pass
  computes per-block token totals, (2) the driver folds them into
  per-block starting offsets (a few hundred numbers — no shuffle), and
  (3) a second pass emits exact global offsets per row from the
  broadcast offsets. Requires a deterministic row order: rows are
  ordered by ``doc_id`` via a range sort first.

* ``q_kmeans`` — Lloyd's iterations driver-orchestrated over
  ``map_batches``: centroids are broadcast each round, every block emits
  per-cluster partial sums (k x dim, tiny), the driver reduces and
  updates. Deterministic: centroids init from the k lowest vec_ids,
  fixed iteration count, float64 throughout.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ..sources.pages import read_pq

WINDOW_TOKENS = 512


def q_pack_windows(sf_dir: str) -> "ray.data.Dataset":
    """Pack docs (ordered by doc_id) into WINDOW_TOKENS-token windows:
    each doc gets its global token start offset and a window id
    (start_tok // WINDOW_TOKENS — contiguous-fill semantics).
    Columns: doc_id, n_tokens, start_tok, window_id."""
    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        toks = [len(x.split()) for x in t["text"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(toks, type=pa.int64()),
        })

    # materialize the SLIM (doc_id, n_tokens) table so both passes see
    # identical block boundaries (sort sampling is not guaranteed to
    # reproduce boundaries across executions); the heavy text column
    # never leaves pass 0.
    counted = ds.map_batches(count, batch_format="pyarrow").sort("doc_id").materialize()

    # pass 1: per-block (first_doc_id, token_total) summaries — only
    # these tiny pairs reach the driver, data stays in the object store.
    def summarize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_id": pa.array([], type=pa.int64()),
                             "total": pa.array([], type=pa.int64())})
        return pa.table({
            "first_id": pa.array([t.column("doc_id")[0].as_py()], type=pa.int64()),
            "total": pa.array(
                [int(pa.compute.sum(t.column("n_tokens")).as_py() or 0)],
                type=pa.int64()),
        })

    summaries = sorted(
        (r["first_id"], r["total"])
        for r in counted.map_batches(summarize, batch_size=None,
                                     batch_format="pyarrow").take_all()
    )
    offsets: Dict[int, int] = {}
    acc = 0
    for first_id, total in summaries:
        offsets[first_id] = acc
        acc += total
    off_ref = ray.put(offsets)

    # pass 2: exact global offsets per row from the broadcast prefix
    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "start_tok": pa.array([], type=pa.int64()),
                "window_id": pa.array([], type=pa.int64()),
            })
        off = ray.get(off_ref)[t.column("doc_id")[0].as_py()]
        n = t.column("n_tokens").to_numpy()
        starts = off + np.concatenate(([0], np.cumsum(n)[:-1])).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": t.column("n_tokens"),
            "start_tok": pa.array(starts, type=pa.int64()),
            "window_id": pa.array(starts // WINDOW_TOKENS, type=pa.int64()),
        })

    return counted.map_batches(emit, batch_size=None, batch_format="pyarrow")


Q_PACK_WINDOWS_SQL = rf"""
WITH counted AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {WINDOW_TOKENS} AS BIGINT) AS window_id
FROM counted
"""


K_CLUSTERS = 8
KMEANS_ITERS = 5


def q_kmeans(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic Lloyd's k-means over the embeddings table
    (K_CLUSTERS clusters, KMEANS_ITERS fixed iterations, centroids
    seeded from the k lowest vec_ids). Returns final assignments.
    Columns: vec_id, cluster. (No SQL oracle: iterative algorithm —
    rows-only check.)"""
    from .similarity import head_rows_by_key

    ds = read_pq(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    # deterministic init: the k lowest vec_ids, selected distributed
    # (no whole-table read on the driver — k rows land here)
    seed_df = head_rows_by_key(ds, "vec_id", K_CLUSTERS)
    centroids = np.array(seed_df["embedding"].tolist(), dtype=np.float64)

    def partials_fn(cref):
        def fn(t: pa.Table) -> pa.Table:
            c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
            m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            k, dim = c.shape
            sums = np.zeros((k, dim)); counts = np.zeros(k, dtype=np.int64)
            for j in range(k):
                sel = assign == j
                counts[j] = int(sel.sum())
                if counts[j]:
                    sums[j] = m[sel].sum(axis=0)
            return pa.table({
                "cluster": pa.array(np.arange(k), type=pa.int64()),
                "count": pa.array(counts, type=pa.int64()),
                "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
            })
        return fn

    for _ in range(KMEANS_ITERS):
        cref = ray.put(centroids)
        parts = ds.map_batches(partials_fn(cref), batch_format="pyarrow").take_all()
        k, dim = centroids.shape
        sums = np.zeros((k, dim)); counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["sum"])
            counts[r["cluster"]] += r["count"]
        nz = counts > 0
        centroids = centroids.copy()
        centroids[nz] = sums[nz] / counts[nz, None]

    cref = ray.put(centroids)

    def assign_fn(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            "vec_id": t["vec_id"],
            "cluster": pa.array(d.argmin(axis=1), type=pa.int64()),
        })

    return ds.map_batches(assign_fn, batch_format="pyarrow")


# ------------------------------------------- sliding-window chunking

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def q_chunk_windows(sf_dir: str, chunk: int = CHUNK_TOKENS,
                    overlap: int = CHUNK_OVERLAP) -> "ray.data.Dataset":
    """Explode each document into fixed-size token chunks with overlap —
    the doc→chunk fan-out every embedding/RAG indexing pipeline runs
    before vectorizing. HF-tokenizer ``return_overflowing_tokens``
    semantics: chunks start at multiples of ``stride = chunk - overlap``
    while the start is inside the doc; the last chunk may be short.
    Empty docs emit no chunks.

    Pure flat-map, NO shuffle: the document text enters exactly once
    and each output row carries only its own slice, so at corpus scale
    this runs at read bandwidth. Tokenization is whitespace split of
    the trimmed text, identical to DuckDB
    ``regexp_split_to_array(trim(text), '\\s+')`` (the `pack_windows`
    convention).
    Columns: doc_id, chunk_idx, start_tok, chunk_tokens, chunk_text.
    """
    stride = chunk - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk")
    ds = read_pq(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids: List[int] = []; idxs: List[int] = []; starts: List[int] = []
        ntoks: List[int] = []; texts: List[str] = []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (txt or "").split()
            nt = len(toks)
            for ci, s in enumerate(range(0, nt, stride)):
                piece = toks[s:s + chunk]
                ids.append(did); idxs.append(ci); starts.append(s)
                ntoks.append(len(piece)); texts.append(" ".join(piece))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "chunk_idx": pa.array(idxs, type=pa.int64()),
            "start_tok": pa.array(starts, type=pa.int64()),
            "chunk_tokens": pa.array(ntoks, type=pa.int64()),
            "chunk_text": pa.array(texts, type=pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def chunk_windows_sql(chunk: int = CHUNK_TOKENS,
                      overlap: int = CHUNK_OVERLAP) -> str:
    """Oracle interpolates the SAME chunk/overlap the operator uses, so
    non-default arguments cannot desync operator and oracle."""
    stride = int(chunk) - int(overlap)
    return rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(text), '\s+') END AS tok
  FROM documents
), n AS (
  SELECT doc_id, tok, len(tok) AS nt FROM toks
), ex AS (
  SELECT doc_id, tok, nt,
         unnest(generate_series(0, CAST(floor((nt - 1) / {stride}.0) AS BIGINT))) AS gs
  FROM n WHERE nt > 0
)
SELECT doc_id,
       CAST(gs AS BIGINT) AS chunk_idx,
       CAST(gs * {stride} AS BIGINT) AS start_tok,
       CAST(least({int(chunk)}, nt - gs * {stride}) AS BIGINT) AS chunk_tokens,
       array_to_string(tok[gs * {stride} + 1 : gs * {stride} + {int(chunk)}], ' ')
           AS chunk_text
FROM ex
"""


Q_CHUNK_WINDOWS_SQL = chunk_windows_sql()


# ------------------------------------------ deterministic seeded shuffle

SHUFFLE_SEED = 42


def q_seeded_shuffle(sf_dir: str, seed: int = SHUFFLE_SEED) -> "ray.data.Dataset":
    """Deterministic global training shuffle: every doc gets a
    content-independent pseudo-random key ``md5(seed || ':' || doc_id)``
    and its exact GLOBAL position in the shuffled order — reproducible
    across runs and cluster sizes (no RNG state, no
    ``random_shuffle()`` nondeterminism), so a resumed training job
    sees the same epoch order.

    Scale shape: only the slim (doc_id, 32-byte key) rows enter the
    range sort — the one unavoidable all-to-all, identical in cost to
    any global shuffle — then positions come from the `pack_windows`
    two-pass prefix trick: per-block counts fold on the driver (a few
    hundred ints) and broadcast back as block offsets; no second
    shuffle, no row data through the driver.
    Columns: doc_id, shuffle_key, pos.
    """
    import hashlib

    ds = read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        keys = [hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in ids]
        return pa.table({
            "doc_id": t["doc_id"],
            "shuffle_key": pa.array(keys, type=pa.string()),
        })

    # materialize so both passes see identical block boundaries (the
    # pack_windows convention — sort sampling is not reproducible).
    keyed = (ds.map_batches(key, batch_format="pyarrow")
               .sort(["shuffle_key", "doc_id"]).materialize())

    def summarize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_key": pa.array([], type=pa.string()),
                             "first_id": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        return pa.table({
            "first_key": pa.array([t.column("shuffle_key")[0].as_py()], type=pa.string()),
            "first_id": pa.array([t.column("doc_id")[0].as_py()], type=pa.int64()),
            "cnt": pa.array([t.num_rows], type=pa.int64()),
        })

    summaries = sorted(
        ((r["first_key"], r["first_id"]), r["cnt"])
        for r in keyed.map_batches(summarize, batch_size=None,
                                   batch_format="pyarrow").take_all()
    )
    offsets: Dict[Any, int] = {}
    acc = 0
    for blk_key, cnt in summaries:
        offsets[blk_key] = acc
        acc += cnt

    off_ref = ray.put(offsets)

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "shuffle_key": pa.array([], type=pa.string()),
                             "pos": pa.array([], type=pa.int64())})
        off = ray.get(off_ref)[(t.column("shuffle_key")[0].as_py(),
                                t.column("doc_id")[0].as_py())]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "shuffle_key": t.column("shuffle_key"),
            "pos": pa.array(off + np.arange(t.num_rows), type=pa.int64()),
        })

    return keyed.map_batches(emit, batch_size=None, batch_format="pyarrow")


def seeded_shuffle_sql(seed: int = SHUFFLE_SEED) -> str:
    return f"""
SELECT doc_id,
       md5('{int(seed)}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
       CAST(ROW_NUMBER() OVER (
            ORDER BY md5('{int(seed)}:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
            AS BIGINT) AS pos
FROM documents
"""


Q_SEEDED_SHUFFLE_SQL = seeded_shuffle_sql()


# ------------------------------------------ source-interleaved epoch order

def _block_start_offsets(keyed: "ray.data.Dataset",
                         key_cols: List[str]) -> "ray.ObjectRef":
    """Per-block start offsets for a SORTED (materialized) dataset: each
    block reports (first-row key tuple, row count); the driver folds the
    tiny list into a cumulative offset per block and broadcasts it.
    The generalization of `q_pack_windows`'s pass-1 trick."""
    def summarize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {c: pa.array([], type=keyed.schema().field(c).type)
                    for c in key_cols}
            cols["cnt"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        cols = {c: t.column(c).slice(0, 1) for c in key_cols}
        cols["cnt"] = pa.array([t.num_rows], type=pa.int64())
        return pa.table(cols)

    rows = keyed.map_batches(summarize, batch_size=None,
                             batch_format="pyarrow").take_all()
    summaries = sorted((tuple(r[c] for c in key_cols), r["cnt"]) for r in rows)
    offsets: Dict[Any, int] = {}
    acc = 0
    for blk_key, cnt in summaries:
        offsets[blk_key] = acc
        acc += cnt
    return ray.put(offsets)


def q_interleave_sources(sf_dir: str, seed: int = SHUFFLE_SEED) -> "ray.data.Dataset":
    """Source-balanced epoch order: shuffle WITHIN each source
    deterministically (md5 rank), then interleave sources round-robin —
    position = global rank by (within-source rank, source). With equal
    source sizes every consecutive window of the epoch carries every
    source once; skewed sources simply run out early (proportional
    front-loading), matching how mixture schedulers spread a small
    high-quality source across the epoch instead of clumping it.

    Scale shape: two range sorts over slim (doc_id, source, 32-byte
    key) rows — the heavyweight text never moves — each followed by the
    block-offset broadcast pass; within-source ranks come from per-block
    (block, source)-segment offsets folded on the driver (O(blocks ×
    sources-per-block) ints). Columns: doc_id, source, rn, pos.
    """
    import hashlib

    ds = read_pq(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])

    def key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "skey": pa.array(
                [hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in ids],
                type=pa.string()),
        })

    by_src = (ds.map_batches(key, batch_format="pyarrow")
                .sort(["source", "skey", "doc_id"]).materialize())

    # pass 1: per-(block, source-segment) counts -> within-source offsets.
    # The block id is the TYPED (source, skey, doc_id) tuple of the
    # block's first row: tuple comparison matches the Dataset sort order
    # exactly (a joined-string key would not — e.g. 'src1' vs 'src10'
    # order flips around the separator byte).
    def seg_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"b_source": pa.array([], type=pa.string()),
                             "b_skey": pa.array([], type=pa.string()),
                             "b_doc": pa.array([], type=pa.int64()),
                             "seg_source": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        bounds = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
        counts = np.diff(np.concatenate((bounds, [len(src)])))
        n = len(bounds)
        return pa.table({
            "b_source": pa.array([src[0]] * n, type=pa.string()),
            "b_skey": pa.array([t["skey"][0].as_py()] * n, type=pa.string()),
            "b_doc": pa.array([t["doc_id"][0].as_py()] * n, type=pa.int64()),
            "seg_source": pa.array(src[bounds], type=pa.string()),
            "cnt": pa.array(counts, type=pa.int64()),
        })

    segs = by_src.map_batches(seg_summary, batch_size=None,
                              batch_format="pyarrow").take_all()
    # within each source, segments accumulate in global block order
    segs.sort(key=lambda r: (r["seg_source"], r["b_source"], r["b_skey"], r["b_doc"]))
    src_acc: Dict[str, int] = {}
    seg_off: Dict[Any, int] = {}
    for r in segs:
        s = r["seg_source"]
        seg_off[(r["b_source"], r["b_skey"], r["b_doc"], s)] = src_acc.get(s, 0)
        src_acc[s] = src_acc.get(s, 0) + r["cnt"]
    off_ref = ray.put(seg_off)

    def emit_rn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string()),
                             "rn": pa.array([], type=pa.int64())})
        off = ray.get(off_ref)
        blk = (t["source"][0].as_py(), t["skey"][0].as_py(), t["doc_id"][0].as_py())
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        bounds = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
        ends = np.concatenate((bounds[1:], [len(src)]))
        rn = np.empty(len(src), dtype=np.int64)
        for b, e in zip(bounds, ends):
            rn[b:e] = off[blk + (src[b],)] + np.arange(e - b)
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "rn": pa.array(rn, type=pa.int64()),
        })

    ranked = (by_src.map_batches(emit_rn, batch_size=None, batch_format="pyarrow")
                    .sort(["rn", "source", "doc_id"]).materialize())

    pos_ref = _block_start_offsets(ranked, ["rn", "source", "doc_id"])

    def emit_pos(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string()),
                             "rn": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64())})
        off = ray.get(pos_ref)[(t["rn"][0].as_py(), t["source"][0].as_py(),
                                t["doc_id"][0].as_py())]
        return t.append_column("pos", pa.array(off + np.arange(t.num_rows),
                                               type=pa.int64()))

    return ranked.map_batches(emit_pos, batch_size=None, batch_format="pyarrow")


def interleave_sources_sql(seed: int = SHUFFLE_SEED) -> str:
    return f"""
WITH k AS (
  SELECT doc_id, source,
         md5('{int(seed)}:' || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
), r AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY skey, doc_id) - 1 AS BIGINT) AS rn
  FROM k
)
SELECT doc_id, source, rn,
       CAST(ROW_NUMBER() OVER (ORDER BY rn, source, doc_id) - 1 AS BIGINT) AS pos
FROM r
"""


Q_INTERLEAVE_SOURCES_SQL = interleave_sources_sql()
