"""PDF branch: writer/parser roundtrip, page ordering, fault absorption."""

from deed_ocr_ray.functions.pdfgen import make_pdf, truncate_pdf
from deed_ocr_ray.stages.extract import extract_row
from deed_ocr_ray.stages.pdf_extract import assemble_pages, parse_pdf_pages


def test_roundtrip_uncompressed():
    pdf = make_pdf([["Hello world", "Second line"], ["Page two only"]])
    texts, n = parse_pdf_pages(pdf)
    assert n == 2
    assert texts == ["Hello world\nSecond line", "Page two only"]


def test_roundtrip_compressed():
    pdf = make_pdf([["alpha beta", "gamma"], ["delta"]], compress=True)
    texts, _ = parse_pdf_pages(pdf)
    assert texts == ["alpha beta\ngamma", "delta"]


def test_escapes():
    pdf = make_pdf([["parens (x) and \\ backslash"]])
    texts, _ = parse_pdf_pages(pdf)
    assert texts == ["parens (x) and \\ backslash"]


def test_page_separator_convention_and_spans():
    body, spans = assemble_pages(["one line", "two\nlines here"])
    assert body == "--- Page 1 ---\none line\n\n--- Page 2 ---\ntwo\nlines here"
    for (kind, s, e, _), expect in zip(spans, ["one line", "two\nlines here"]):
        assert kind == "page"
        assert body[s:e] == expect


def test_empty_page_block_has_no_trailing_newline():
    body, spans = assemble_pages(["", "x"])
    assert body == "--- Page 1 ---\n\n--- Page 2 ---\nx"
    assert spans[0][1] == spans[0][2]  # empty span


def test_truncated_pdf_is_error_row():
    pdf = truncate_pdf(make_pdf([["some text"] for _ in range(3)]))
    row = extract_row(pdf, "", "en")
    assert row["payload_kind"] == "pdf"
    assert row["status"] == "error"
    assert row["error_type"] == "pdf_parse_error"


def test_garbage_after_magic_is_error_row_not_exception():
    row = extract_row(b"%PDF-1.4\x00\x01\x02 garbage", "", "en")
    assert row["status"] == "error"


def test_watermark_removed_from_pdf_lines():
    pdf = make_pdf([["before UNOFFICIAL COPY after"]])
    texts, _ = parse_pdf_pages(pdf)
    assert texts == ["before after"]
