"""CLI surface, run report, export sinks, extractor registry (X1)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from deed_ocr_ray.cli import main as cli_main
from deed_ocr_ray.fixtures import write_pages_corpus
from deed_ocr_ray.state.manifest import manifest_path
from deed_ocr_ray.state.report import format_report, retry_candidates, run_report


@pytest.fixture(scope="module")
def run_dir(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("clirun")
    corpus = str(root / "pages")
    out = str(root / "out")
    write_pages_corpus(corpus, 120, seed=7, n_shards=4)
    rc = cli_main(["extract", corpus, out, "--files-per-part", "1",
                   "--wave-parts", "2"])
    assert rc == 0
    return corpus, out


def test_cli_extract_writes_partitions_and_manifests(run_dir):
    _, out = run_dir
    parts = [d for d in os.listdir(out) if d.startswith("part_id=")]
    assert len(parts) == 4
    assert os.path.isdir(os.path.join(out, "_manifests"))


def test_run_report_aggregates_manifests(run_dir):
    _, out = run_dir
    s = run_report(out, planned_parts=4)
    assert s["parts_completed"] == 4
    assert s["row_count"] == 120
    assert s["ok_count"] + s["error_count"] == 120
    assert s["error_count"] > 0  # corpus has truncated pdf / junk rows
    assert "pdf_parse_error" in s["error_counts"]
    txt = format_report(s, retry_candidates(out))
    assert "rows:" in txt and "errors by type:" in txt


def test_retry_candidates_by_class(run_dir):
    _, out = run_dir
    # content-shaped errors are not retry candidates by default
    assert retry_candidates(out) == []
    cands = retry_candidates(out, ["pdf_parse_error"])
    assert cands  # the class exists somewhere
    m = json.load(open(manifest_path(out, cands[0])))
    assert m["error_counts"].get("pdf_parse_error", 0) > 0


def test_cli_resume_noop(run_dir, capsys):
    corpus, out = run_dir
    rc = cli_main(["extract", corpus, out, "--resume",
                   "--files-per-part", "1", "--wave-parts", "2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["parts_skipped"] == 4
    assert summary["n_rows"] == 120


@pytest.mark.parametrize("fmt", ["json", "csv", "parquet"])
def test_export_formats(run_dir, tmp_path, fmt):
    _, out = run_dir
    dest = str(tmp_path / f"exp_{fmt}")
    rc = cli_main(["export", out, dest, "--format", fmt])
    assert rc == 0
    files = os.listdir(dest)
    assert files
    if fmt == "csv":
        import csv

        with open(os.path.join(dest, sorted(files)[0])) as f:
            header = next(csv.reader(f))
        assert "spans" in header and "extracted_text" in header
    if fmt == "parquet":
        assert sum(pq.ParquetFile(os.path.join(dest, f)).metadata.num_rows
                   for f in files if f.endswith(".parquet")) == 120


def test_extractor_registry_override(ray_session):
    from deed_ocr_ray.stages.extract import BRANCHES, extract_row

    def shouty(html, text, lang):
        return "CUSTOM", [("custom", 0, 6, 1.0)], "", 1, 1

    row = extract_row(None, "hello world", "en",
                      branches={**BRANCHES, "text": shouty})
    assert row["extracted_text"] == "CUSTOM"
    assert row["spans"][0][0] == "custom"
    # default table untouched
    assert extract_row(None, "hello world", "en")["extracted_text"] == "hello world"
