"""The composed training-data prep pipeline: the "run every pipeline
they run today" flagship that chains the engine's stages end-to-end —

    pages ──extract──> ok rows ──quality filter──> exact dedup (first
    capture wins) ──> token counts ──> packed training windows

Every stage is one of the engine's existing primitives: the extraction
actor stage, vectorized Arrow filters, the coarse-partitioned dedup
shuffle (fingerprints only — text never crosses the exchange), and the
two-pass distributed prefix sum for window packing.
"""

from __future__ import annotations

import hashlib
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .corpus import pages_corpus_for
from .extract_pipeline import extract_dataset
from ..sources.pages import read_pages

MIN_TOKENS = 10
WINDOW_TOKENS = 512
N_DEDUP_PARTS = 256


def q_training_prep(sf_dir: str) -> "ray.data.Dataset":
    """Full prep chain over the synthesized pages corpus. Returns one
    row per surviving document: url, warc_ts, n_tokens, start_tok,
    window_id. (No SQL oracle: extraction is not SQL-expressible; the
    downstream stages are oracle-checked individually.)"""
    corpus = pages_corpus_for(sf_dir)
    extracted = extract_dataset(read_pages(corpus))

    # ok rows -> (part, fp, url, warc_ts, n_tokens): fingerprint + token
    # count computed in the SAME pass; only slim columns continue.
    def slim(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["status"], "ok")
        t = t.filter(keep)
        fps, toks = [], []
        for x in t["extracted_text"].to_pylist():
            fps.append(hashlib.md5(x.encode("utf-8")).hexdigest())
            toks.append(len(x.split()))
        part = [int(f[:4], 16) % N_DEDUP_PARTS for f in fps]
        out = pa.table({
            "part": pa.array(part, type=pa.int32()),
            "fp": pa.array(fps, type=pa.string()),
            "url": t["url"].cast(pa.string()),
            "warc_ts": t["warc_ts"].cast(pa.timestamp("us")),
            "n_tokens": pa.array(toks, type=pa.int64()),
        })
        return out.filter(pc.greater_equal(out["n_tokens"], MIN_TOKENS))

    slimmed = extracted.map_batches(slim, batch_format="pyarrow")

    # exact dedup, first capture wins by (warc_ts, url): coarse-keyed
    # shuffle on fp prefix, vectorized in-partition resolution.
    def first_per_fp(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["fp", "warc_ts", "url"]).drop_duplicates("fp", keep="first")
        return pa.table({
            "url": pa.array(g["url"].tolist(), type=pa.string()),
            "warc_ts": pa.Array.from_pandas(g["warc_ts"], type=pa.timestamp("us")),
            "n_tokens": pa.array(g["n_tokens"].to_numpy(), type=pa.int64()),
        })

    uniq = (
        slimmed.groupby("part")
        .map_groups(first_per_fp, batch_format="pandas")
        .sort(["url", "warc_ts"])
        .materialize()  # slim table; both packing passes need identical blocks
    )

    # window packing: two-pass distributed prefix sum (see packing.py)
    # block key = FULL first-row key (url, warc_ts): duplicate urls with
    # different content both survive dedup, so url alone could collide
    def summarize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_url": pa.array([], type=pa.string()),
                             "first_ts": pa.array([], type=pa.timestamp("us")),
                             "total": pa.array([], type=pa.int64())})
        return pa.table({
            "first_url": pa.array([t.column("url")[0].as_py()], type=pa.string()),
            "first_ts": pa.array([t.column("warc_ts")[0].as_py()],
                                 type=pa.timestamp("us")),
            "total": pa.array(
                [int(pc.sum(t.column("n_tokens")).as_py() or 0)], type=pa.int64()),
        })

    sums = sorted(
        ((r["first_url"], r["first_ts"]), r["total"])
        for r in uniq.map_batches(summarize, batch_size=None,
                                  batch_format="pyarrow").take_all()
    )
    offsets: Dict[tuple, int] = {}
    acc = 0
    for key, total in sums:
        offsets[key] = acc
        acc += total
    off_ref = ray.put(offsets)

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "url": pa.array([], type=pa.string()),
                "warc_ts": pa.array([], type=pa.timestamp("us")),
                "n_tokens": pa.array([], type=pa.int64()),
                "start_tok": pa.array([], type=pa.int64()),
                "window_id": pa.array([], type=pa.int64()),
            })
        off = ray.get(off_ref)[
            (t.column("url")[0].as_py(), t.column("warc_ts")[0].as_py())
        ]
        n = t.column("n_tokens").to_numpy()
        starts = off + np.concatenate(([0], np.cumsum(n)[:-1])).astype(np.int64)
        return pa.table({
            "url": t.column("url"),
            "warc_ts": t.column("warc_ts"),
            "n_tokens": t.column("n_tokens"),
            "start_tok": pa.array(starts, type=pa.int64()),
            "window_id": pa.array(starts // WINDOW_TOKENS, type=pa.int64()),
        })

    return uniq.map_batches(emit, batch_size=None, batch_format="pyarrow")


# -------------------------------------- cross-doc paragraph dedup (C4)

PARA_PARTS = 256


def q_paragraph_dedup(sf_dir: str) -> "ray.data.Dataset":
    """C4-style cross-document PARAGRAPH dedup over the extracted
    corpus: every block (extracted_text is blocks joined by "\\n\\n")
    is fingerprinted; corpus-wide duplicate blocks keep only the FIRST
    occurrence by (url, block_idx) and are dropped everywhere else
    (the C4/Gopher exact line-dedup rule — kills cross-site
    boilerplate the per-page classifier can't see). Docs are then
    reassembled in original block order.

    Shape: two full-corpus exchanges, both inherent to the semantics
    (copies must co-locate to be resolved; blocks must return to their
    doc to reassemble) — the C4 pipeline's own cost model. Block text
    rides a coarse hash(fp) partition (PARA_PARTS-way), winner
    selection is pandas-vectorized per partition (one UDF call per
    partition, not per block), and the reassembly groupby moves only
    kept blocks.
    Columns: url, warc_ts, clean_text, n_blocks, n_dropped.
    Doc identity is (url, warc_ts): the corpus carries duplicate urls
    with distinct capture timestamps by design.
    (No SQL oracle: extraction-derived; exactness pinned by a
    single-process recount pytest.)"""
    corpus = pages_corpus_for(sf_dir)
    extracted = extract_dataset(read_pages(corpus))
    return paragraph_dedup_dataset(extracted)


def paragraph_dedup_dataset(extracted: "ray.data.Dataset") -> "ray.data.Dataset":
    def explode(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["status"], "ok"))
        urls, tss, idxs, parts, fps, texts, tots = [], [], [], [], [], [], []
        for url, ts, txt in zip(t["url"].to_pylist(),
                                t["warc_ts"].to_pylist(),
                                t["extracted_text"].to_pylist()):
            if not txt:
                continue
            blocks = txt.split("\n\n")
            for i, blk in enumerate(blocks):
                fp = hashlib.md5(blk.encode("utf-8")).hexdigest()
                urls.append(url)
                tss.append(ts)
                idxs.append(i)
                fps.append(fp)
                parts.append(int(fp[:4], 16) % PARA_PARTS)
                texts.append(blk)
                tots.append(len(blocks))
        return pa.table({
            "part": pa.array(parts, type=pa.int32()),
            "fp": pa.array(fps, type=pa.string()),
            # (url, warc_ts) is the doc key: the corpus has duplicate
            # urls (differing warc_ts) by design
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "idx": pa.array(idxs, type=pa.int64()),
            # per-doc block total rides every row so the reassembly can
            # report true drop counts even when trailing blocks drop
            "tot": pa.array(tots, type=pa.int64()),
            "block": pa.array(texts, type=pa.string()),
        })

    def resolve(g: pd.DataFrame) -> pa.Table:
        # keep = the (url, idx)-min row per fp, vectorized: sort then
        # first-of-group (deterministic total order)
        g = g.sort_values(["fp", "url", "warc_ts", "idx"], kind="mergesort")
        out = g[~g.duplicated("fp", keep="first")]
        return pa.table({
            "url": pa.array(out["url"].tolist(), type=pa.string()),
            "warc_ts": pa.Array.from_pandas(out["warc_ts"],
                                            type=pa.timestamp("us")),
            "idx": pa.array(out["idx"].to_numpy(), type=pa.int64()),
            "tot": pa.array(out["tot"].to_numpy(), type=pa.int64()),
            "block": pa.array(out["block"].tolist(), type=pa.string()),
        })

    def add_doc_part(t: pa.Table) -> pa.Table:
        # coarse-partition the reassembly: per-DOC map_groups pays one
        # Ray UDF call per document (measured ~6 s of pure call
        # overhead at 4.4k docs); hashing docs into PARA_PARTS groups
        # and doing the per-doc fold with a local pandas groupby keeps
        # the same exchange and drops the overhead
        h = pd.util.hash_array(np.asarray(t["url"].to_pylist(),
                                          dtype=object))
        return t.append_column(
            "dpart", pa.array((h % PARA_PARTS).astype(np.int32),
                              type=pa.int32()))

    def rebuild_part(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["url", "warc_ts", "idx"])
        agg = g.groupby(["url", "warc_ts"], sort=False).agg(
            clean_text=("block", "\n\n".join),
            n_blocks=("block", "size"),
            tot=("tot", "first"),
        ).reset_index()
        return pa.table({
            "url": pa.array(agg["url"].tolist(), type=pa.string()),
            "warc_ts": pa.Array.from_pandas(agg["warc_ts"],
                                            type=pa.timestamp("us")),
            "clean_text": pa.array(agg["clean_text"].tolist(),
                                   type=pa.string()),
            "n_blocks": pa.array(
                agg["n_blocks"].to_numpy().astype(np.int64),
                type=pa.int64()),
            "n_dropped": pa.array(
                (agg["tot"] - agg["n_blocks"]).to_numpy().astype(np.int64),
                type=pa.int64()),
        })

    # docs whose every block was a duplicate vanish from the output
    # entirely (C4 semantics: nothing left to train on)
    return (
        extracted.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pandas")
        .map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(rebuild_part, batch_format="pandas")
    )
