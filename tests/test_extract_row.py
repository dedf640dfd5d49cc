"""Per-row extraction contract over the fixture corpus (no Ray needed)."""

import collections

from deed_ocr_ray.fixtures import SF_TEST, class_of, gen_row
from deed_ocr_ray.functions.normalize import normalize_text
from deed_ocr_ray.stages.extract import extract_row

EXPECT_STATUS = {
    "html_clean": ("ok", ""),
    "html_messy": ("ok", ""),
    "html_boiler_heavy": ("ok", ""),
    "html_watermarked": ("ok", ""),
    "pdf_min": ("ok", ""),
    "pdf_truncated": ("error", "pdf_parse_error"),
    "text_only": ("ok", ""),
    "empty": ("ok", ""),
    "giant": ("ok", ""),
    "binary_junk": ("error", "decode_error"),
}

EXPECT_KIND = {
    "pdf_min": "pdf", "pdf_truncated": "pdf", "text_only": "text",
    "empty": "empty", "binary_junk": "html",
}


def _rows(n=200):
    for d in range(n):
        r = gen_row(SF_TEST["seed"], d, SF_TEST["giant_bytes"])
        yield d, class_of(d), r, extract_row(r["html"], r["text"], r["lang"])


def test_status_and_kind_contract():
    for d, cls, _r, out in _rows():
        assert (out["status"], out["error_type"]) == EXPECT_STATUS[cls], (d, cls, out["error_type"])
        if cls in EXPECT_KIND:
            assert out["payload_kind"] == EXPECT_KIND[cls], (d, cls)
        else:
            assert out["payload_kind"] == "html"


def test_extracted_text_is_normalize_fixed_point():
    for d, cls, _r, out in _rows():
        t = out["extracted_text"]
        assert normalize_text(t) == t, (d, cls)


def test_no_watermarks_survive():
    for d, cls, _r, out in _rows():
        assert "UNO" not in out["extracted_text"], (d, cls)


def test_spans_round_trip():
    # offsets index into extracted_text (LegalDescription start/end_char
    # semantics, deed_ocr/main.py:38-39)
    for d, cls, _r, out in _rows():
        t = out["extracted_text"]
        for kind, s, e, score in out["spans"]:
            assert 0 <= s <= e <= len(t), (d, cls, kind)
            assert 0.0 <= score <= 1.0


def test_field_spans_match_fields_lists():
    for d, cls, _r, out in _rows():
        t = out["extracted_text"]
        trs_from_spans = [t[s:e] for k, s, e, _ in out["spans"] if k == "trs"]
        for v in out["fields"]["trs"]:
            assert v in trs_from_spans


def test_content_extracted_where_expected():
    counts = collections.Counter()
    for d, cls, _r, out in _rows():
        counts[cls] += 1
        if cls in ("html_clean", "html_watermarked", "giant", "pdf_min", "text_only"):
            assert len(out["extracted_text"]) > 0, (d, cls)
        if cls == "html_clean":
            assert out["fields"]["title"], (d, cls)
        if cls == "empty":
            assert out["extracted_text"] == ""
    # every class sampled
    assert len(counts) == 10


def test_pdf_page_headers_present():
    for d, cls, _r, out in _rows(100):
        if cls == "pdf_min" and out["status"] == "ok":
            assert out["extracted_text"].startswith("--- Page 1 ---\n")


def test_deterministic_rerun():
    for d in (0, 40, 55, 65, 70, 83, 93, 95):
        r1 = gen_row(42, d, 65536)
        r2 = gen_row(42, d, 65536)
        assert r1 == r2
        o1 = extract_row(r1["html"], r1["text"], r1["lang"])
        o2 = extract_row(r2["html"], r2["text"], r2["lang"])
        assert o1 == o2
