"""Deterministic pages-corpus synthesis keyed to a testdata sf dir.

BASELINE.json's input is a Common-Crawl-style pages table that does not
exist in ``/root/testdata``; per the driver instruction it is
synthesized deterministically at matching scale (row count = the sf's
``documents`` row count) and cached under ``/tmp`` so repeated
queries/bench runs reuse it. Content depends only on ``(seed, doc_id)``
— never on sharding or wall-clock.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from ..fixtures import write_pages_corpus

CACHE_ROOT = "/tmp/deed_ocr_ray_pages"
SEED = 42
GIANT_BYTES = 262144


def _sf_rows(sf_dir: str) -> int:
    return pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows


def pages_corpus_for(sf_dir: str, use_ray: bool = True) -> str:
    """Materialize (once) and return the pages corpus dir for ``sf_dir``."""
    n = _sf_rows(sf_dir)
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(CACHE_ROOT, f"{name}_{n}_s{SEED}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    n_shards = 4 if n <= 1000 else (8 if n <= 10000 else 16)
    import shutil

    if os.path.isdir(out):
        shutil.rmtree(out)
    try:
        import ray

        use_ray = use_ray and ray.is_initialized()
    except Exception:  # pragma: no cover
        use_ray = False
    write_pages_corpus(out, n, seed=SEED, n_shards=n_shards,
                       giant_bytes=GIANT_BYTES, use_ray=use_ray)
    with open(marker, "w") as f:
        f.write("ok")
    return out
