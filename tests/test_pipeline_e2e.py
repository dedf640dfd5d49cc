"""End-to-end pipeline tests: byte-identical golden outputs, checkpoint
manifests, resume anti-join (the BASELINE.json correctness invariant)."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from deed_ocr_ray.fixtures import SF_TEST, write_pages_corpus
from deed_ocr_ray.schema import DETERMINISTIC_COLUMNS
from deed_ocr_ray.state.manifest import load_manifests, manifest_path, part_dir

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extracted_sf_test.parquet")


def _canonical(tbl: pa.Table) -> pa.Table:
    tbl = tbl.select(DETERMINISTIC_COLUMNS)
    golden_schema = pq.read_schema(GOLDEN)
    tbl = tbl.cast(golden_schema)
    idx = pc.sort_indices(tbl, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")])
    return tbl.take(idx).combine_chunks()


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_sf_test")
    write_pages_corpus(
        str(d), SF_TEST["n_rows"], seed=SF_TEST["seed"],
        n_shards=SF_TEST["n_shards"], giant_bytes=SF_TEST["giant_bytes"],
    )
    return str(d)


def test_e2e_byte_identical_to_golden(ray_session, corpus_dir, tmp_path):
    from deed_ocr_ray.pipelines.extract_pipeline import run_extract

    out = str(tmp_path / "out")
    summary = run_extract(corpus_dir, out, files_per_part=2, wave_parts=2, concurrency=2)
    assert summary["n_rows"] == SF_TEST["n_rows"]

    got = _canonical(pq.read_table(out))
    want = pq.read_table(GOLDEN).combine_chunks()
    assert got.num_rows == want.num_rows
    # column-by-column for a readable failure
    for name in DETERMINISTIC_COLUMNS:
        assert got.column(name).equals(want.column(name)), f"column {name} differs"


def test_manifests_written_with_lineage_and_metrics(ray_session, corpus_dir, tmp_path):
    from deed_ocr_ray.pipelines.extract_pipeline import run_extract

    out = str(tmp_path / "out")
    run_extract(corpus_dir, out, files_per_part=2, wave_parts=None, concurrency=2)
    manifests = load_manifests(out)
    assert len(manifests) == 3  # 6 shards / 2 per part
    total = 0
    for pid, m in manifests.items():
        assert m["lineage_id"]
        assert m["input_files"]
        assert m["row_count"] == m["ok_count"] + sum(m["error_counts"].values())
        assert m["bytes_in"] > 0 and m["bytes_out"] > 0
        total += m["row_count"]
    assert total == SF_TEST["n_rows"]


def test_resume_skips_completed_and_matches_uninterrupted(ray_session, corpus_dir, tmp_path):
    from deed_ocr_ray.pipelines.extract_pipeline import run_extract

    full_out = str(tmp_path / "full")
    run_extract(corpus_dir, full_out, files_per_part=1, wave_parts=None, concurrency=2)

    # simulate a crash: keep parts 0-2 complete, drop 3-5; part 4 has
    # partial data but NO manifest (must be wiped and re-done)
    resumed_out = str(tmp_path / "resumed")
    shutil.copytree(full_out, resumed_out)
    for pid in (3, 4, 5):
        os.remove(manifest_path(resumed_out, pid))
    for pid in (3, 5):
        shutil.rmtree(part_dir(resumed_out, pid))
    # part 4 keeps its (now manifest-less) data -> stale partial

    summary = run_extract(
        corpus_dir, resumed_out, resume=True, files_per_part=1, wave_parts=None, concurrency=2
    )
    assert summary["parts_skipped"] == 3
    assert summary["n_rows"] == SF_TEST["n_rows"]

    got = _canonical(pq.read_table(resumed_out))
    want = _canonical(pq.read_table(full_out))
    assert got.equals(want)


def test_resume_noop_when_all_complete(ray_session, corpus_dir, tmp_path):
    from deed_ocr_ray.pipelines.extract_pipeline import run_extract

    out = str(tmp_path / "out")
    run_extract(corpus_dir, out, files_per_part=2, wave_parts=None, concurrency=2)
    before = {p: os.path.getmtime(manifest_path(out, p)) for p in load_manifests(out)}
    summary = run_extract(corpus_dir, out, resume=True, files_per_part=2,
                          wave_parts=None, concurrency=2)
    assert summary["parts_skipped"] == 3
    after = {p: os.path.getmtime(manifest_path(out, p)) for p in load_manifests(out)}
    assert before == after  # nothing re-processed


def test_error_rows_absorbed_not_raised(ray_session, corpus_dir, tmp_path):
    from deed_ocr_ray.pipelines.extract_pipeline import run_extract

    out = str(tmp_path / "out")
    summary = run_extract(corpus_dir, out, files_per_part=3, wave_parts=None, concurrency=2)
    # corpus contains pdf_truncated (3%) and binary_junk (5%) rows
    assert summary["error_counts"].get("pdf_parse_error", 0) > 0
    assert summary["error_counts"].get("decode_error", 0) > 0
    assert summary["n_ok"] + sum(summary["error_counts"].values()) == summary["n_rows"]


def test_byte_bounded_blocks_identical_output(ray_session, corpus_dir, tmp_path):
    """Skew guard: an aggressively small target_max_block_size (64 KiB,
    so giant rows form single-row blocks) must not change any output
    byte, and DataContext must be restored afterwards."""
    import ray.data as rd

    from deed_ocr_ray.pipelines.extract_pipeline import run_extract

    prev = rd.DataContext.get_current().target_max_block_size
    a = str(tmp_path / "dflt")
    b = str(tmp_path / "tiny")
    run_extract(corpus_dir, a, files_per_part=2, wave_parts=None, concurrency=2)
    run_extract(corpus_dir, b, files_per_part=2, wave_parts=None, concurrency=2,
                target_block_bytes=64 * 1024)
    assert rd.DataContext.get_current().target_max_block_size == prev
    ta = _canonical(pq.read_table(a))
    tb = _canonical(pq.read_table(b))
    assert ta.equals(tb)


def test_resume_detects_changed_shard_plan(ray_session, tmp_path):
    """Lineage validation on resume: a new shard that sorts into the
    middle re-shuffles the partition plan; stale manifests must NOT be
    trusted — the resumed output must equal a fresh full run."""
    from deed_ocr_ray.fixtures import build_pages_table, write_pages_corpus
    from deed_ocr_ray.pipelines.extract_pipeline import run_extract

    corpus = str(tmp_path / "pages")
    write_pages_corpus(corpus, 120, seed=5, n_shards=4)
    out = str(tmp_path / "out")
    run_extract(corpus, out, files_per_part=1, wave_parts=None, concurrency=2)

    # new shard sorting between shard_0001 and shard_0002
    extra = build_pages_table(777, range(120, 150), 65536)
    pq.write_table(extra, os.path.join(corpus, "shard_0001a.parquet"))

    summary = run_extract(corpus, out, resume=True, files_per_part=1,
                          wave_parts=None, concurrency=2)
    # parts 0-1 keep their lineage; the insertion shifts every later part
    assert summary["parts_skipped"] == 2
    assert summary["n_rows"] == 150

    fresh = str(tmp_path / "fresh")
    run_extract(corpus, fresh, files_per_part=1, wave_parts=None, concurrency=2)
    assert _canonical(pq.read_table(out)).equals(_canonical(pq.read_table(fresh)))


def test_iter_extracted_streams_batches(ray_session, corpus_dir, tmp_path):
    from deed_ocr_ray.pipelines.extract_pipeline import iter_extracted, run_extract

    out = str(tmp_path / "out")
    run_extract(corpus_dir, out, files_per_part=3, wave_parts=None, concurrency=2)
    total = 0
    n_batches = 0
    for b in iter_extracted(out, columns=["url", "n_chars"], batch_size=64):
        assert b.num_rows <= 64
        assert b.column_names == ["url", "n_chars"]
        total += b.num_rows
        n_batches += 1
    assert total == SF_TEST["n_rows"]
    assert n_batches >= total // 64


def test_pool_config_always_leaves_a_whole_spare_cpu():
    """Deadlock guard: at every cluster size, total actor reservation
    leaves >= 1 whole CPU so a 1-CPU read task can schedule."""
    from deed_ocr_ray.pipelines.extract_pipeline import pool_config

    for ncpu in (1, 2, 3, 4, 5, 8, 16, 32, 64, 128, 256):
        k, c = pool_config(ncpu)
        assert k >= 2 and 0.25 <= c <= 1.0
        assert ncpu - k * c >= 1.0 - 1e-9 or ncpu <= 2, (ncpu, k, c)


def test_failed_wave_restores_data_context(ray_session, corpus_dir, tmp_path,
                                           monkeypatch):
    """A write failure mid-wave must not leak the global
    target_max_block_size override (try/finally contract)."""
    import ray.data as rd

    from deed_ocr_ray.pipelines import extract_pipeline as ep

    prev = rd.DataContext.get_current().target_max_block_size

    def boom(self, *a, **k):
        raise RuntimeError("disk gone")

    monkeypatch.setattr(rd.Dataset, "write_parquet", boom)
    with pytest.raises(RuntimeError):
        ep.run_extract(corpus_dir, str(tmp_path / "out"), files_per_part=2,
                       wave_parts=2, concurrency=2,
                       target_block_bytes=123 * 1024)
    assert rd.DataContext.get_current().target_max_block_size == prev
