"""Freeze golden outputs for the sf_test corpus.

Runs the pure per-row extractor (no Ray) over the frozen SF_TEST corpus
parameters and writes ``tests/golden/extracted_sf_test.parquet`` with the
deterministic columns, sorted by (url, warc_ts). Regenerating goldens is
an explicit step: ``python tools/freeze_golden.py`` — review the diff.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deed_ocr_ray.fixtures import SF_TEST, build_pages_table  # noqa: E402
from deed_ocr_ray.schema import DETERMINISTIC_COLUMNS  # noqa: E402
from deed_ocr_ray.stages.extract import extract_table  # noqa: E402


def golden_table() -> pa.Table:
    pages = build_pages_table(
        SF_TEST["seed"], range(SF_TEST["n_rows"]), SF_TEST["giant_bytes"]
    )
    out = extract_table(pages)
    out = out.select(DETERMINISTIC_COLUMNS)
    idx = pc.sort_indices(
        out, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
    )
    return out.take(idx)


def main() -> None:
    import pyarrow.parquet as pq

    dst = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(dst, exist_ok=True)
    path = os.path.join(dst, "extracted_sf_test.parquet")
    pq.write_table(golden_table(), path, compression="zstd")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
