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

WINDOW_TOKENS = 512


def q_pack_windows(sf_dir: str) -> "ray.data.Dataset":
    """Pack docs (ordered by doc_id) into WINDOW_TOKENS-token windows:
    each doc gets its global token start offset and a window id
    (start_tok // WINDOW_TOKENS — contiguous-fill semantics).
    Columns: doc_id, n_tokens, start_tok, window_id."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

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

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
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
