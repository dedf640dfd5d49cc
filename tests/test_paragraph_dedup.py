"""Cross-document paragraph dedup (C4-style exact block dedup):
single-process recount parity on the fixture corpus plus a crafted
duplicate-block case."""

from __future__ import annotations

import collections

import pyarrow as pa
import pytest

from deed_ocr_ray.pipelines.prep import paragraph_dedup_dataset


def _extracted_table(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], type=pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "status": pa.array(["ok"] * len(rows), type=pa.string()),
        "extracted_text": pa.array([r[2] for r in rows], type=pa.string()),
    })


def test_crafted_duplicates(ray_session):
    import ray.data

    rows = [
        ("https://a.example/1", 1_000_000, "alpha\n\nshared boiler\n\nbeta"),
        ("https://b.example/2", 2_000_000, "shared boiler\n\ngamma"),
        ("https://c.example/3", 3_000_000, "shared boiler"),
        ("https://a.example/1", 4_000_000, "alpha\n\ndelta"),  # dup url, later ts
    ]
    out = {(r["url"], r["warc_ts"].timestamp() * 1e6): r
           for r in paragraph_dedup_dataset(
               ray.data.from_arrow(_extracted_table(rows))).take_all()}
    a1 = out[("https://a.example/1", 1_000_000)]
    assert a1["clean_text"] == "alpha\n\nshared boiler\n\nbeta"
    assert (a1["n_blocks"], a1["n_dropped"]) == (3, 0)
    b = out[("https://b.example/2", 2_000_000)]
    assert b["clean_text"] == "gamma"
    assert (b["n_blocks"], b["n_dropped"]) == (1, 1)
    # doc c loses its only block -> vanishes (C4 semantics)
    assert ("https://c.example/3", 3_000_000) not in out
    # later capture of the dup url loses "alpha" to the earlier one
    a2 = out[("https://a.example/1", 4_000_000)]
    assert a2["clean_text"] == "delta"
    assert (a2["n_blocks"], a2["n_dropped"]) == (1, 1)
    assert len(out) == 3


def test_corpus_recount_parity(ray_session):
    """Distributed result == single-process recount on 240 fixture docs."""
    import ray.data

    from deed_ocr_ray.fixtures import build_pages_table
    from deed_ocr_ray.pipelines.extract_pipeline import extract_dataset

    pages = ray.data.from_arrow(build_pages_table(42, range(240),
                                                  giant_bytes=65536))
    extracted = extract_dataset(pages).select_columns(
        ["url", "warc_ts", "status", "extracted_text"]).materialize()

    got = {(r["url"], r["warc_ts"]): r
           for r in paragraph_dedup_dataset(extracted).take_all()}

    # single-process reference: first occurrence by (url, warc_ts, idx)
    docs = []
    for r in sorted(extracted.take_all(),
                    key=lambda r: (r["url"], r["warc_ts"])):
        if r["status"] == "ok" and r["extracted_text"]:
            docs.append((r["url"], r["warc_ts"],
                         r["extracted_text"].split("\n\n")))
    first: dict = {}
    for url, ts, blocks in docs:
        for i, b in enumerate(blocks):
            key = (url, ts, i)
            if b not in first or (first[b] > key):
                first[b] = key
    total_dropped = 0
    n_docs = 0
    for url, ts, blocks in docs:
        kept = [b for i, b in enumerate(blocks)
                if first[b] == (url, ts, i)]
        dropped = len(blocks) - len(kept)
        total_dropped += dropped
        if not kept:
            assert (url, ts) not in got
            continue
        n_docs += 1
        r = got[(url, ts)]
        assert r["clean_text"] == "\n\n".join(kept)
        assert r["n_blocks"] == len(kept)
        assert r["n_dropped"] == dropped
    assert len(got) == n_docs
    assert total_dropped > 0  # the fixture corpus genuinely dedups
