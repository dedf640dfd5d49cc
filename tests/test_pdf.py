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


# -------------------------------------------------- layout hierarchy (M6)

def test_layout_hierarchy_roundtrip():
    from deed_ocr_ray.stages.pdf_extract import parse_pdf_layout

    pdf = make_pdf([["Hello world", "Second line"], ["Page two only"]])
    pages = parse_pdf_layout(pdf)
    assert [p["page_number"] for p in pages] == [1, 2]
    p1 = pages[0]
    assert p1["n_blocks"] == len(p1["blocks"]) >= 1
    lines = [l for b in p1["blocks"] for l in b["lines"]]
    assert [l["text"] for l in lines] == ["Hello world", "Second line"]
    assert [w["text"] for w in lines[0]["words"]] == ["Hello", "world"]
    # per-node confidences: words alnum ratio, parents average upward
    for b in p1["blocks"]:
        for l in b["lines"]:
            for w in l["words"]:
                assert 0.0 <= w["conf"] <= 1.0
            assert l["conf"] == round(
                sum(w["conf"] for w in l["words"]) / len(l["words"]), 3)
        assert b["conf"] == round(
            sum(l["conf"] for l in b["lines"]) / len(b["lines"]), 3)


def test_layout_words_match_page_text_tokens():
    from deed_ocr_ray.stages.pdf_extract import parse_pdf_layout

    spec = [["alpha beta gamma", "delta"], ["eps (x) zeta"]]
    pdf = make_pdf(spec, compress=True)
    texts, _ = parse_pdf_pages(pdf)
    pages = parse_pdf_layout(pdf)
    for text, page in zip(texts, pages):
        layout_words = [w["text"] for b in page["blocks"]
                        for l in b["lines"] for w in l["words"]]
        assert layout_words == text.split()


def test_layout_absorbs_faults():
    from deed_ocr_ray.stages.pdf_extract import parse_pdf_layout

    assert parse_pdf_layout(b"not a pdf at all") == []
    trunc = truncate_pdf(make_pdf([["some text"] for _ in range(3)]))
    pages = parse_pdf_layout(trunc)  # no exception; pages may be partial
    for p in pages:
        assert p["n_blocks"] == len(p["blocks"])


def test_layout_stage_nested_and_flattened(ray_session):
    import pyarrow as pa

    from deed_ocr_ray.stages.pdf_extract import (
        LAYOUT_TYPE, PdfLayoutStage, parse_pdf_layout,
    )

    pdf = make_pdf([["Hello world", "Second line"], ["Page two only"]])
    batch = pa.table({
        "url": pa.array(["u1", "u2"], type=pa.string()),
        "html": pa.array([pdf, b"<html>not pdf</html>"], type=pa.binary()),
    })
    nested = PdfLayoutStage(flatten=False)(batch)
    assert nested.num_rows == 1  # non-PDF row dropped
    assert nested.schema.field("layout").type == LAYOUT_TYPE
    flat = PdfLayoutStage(flatten=True)(batch)
    n_words = sum(len(l["words"]) for p in parse_pdf_layout(pdf)
                  for b in p["blocks"] for l in b["lines"])
    assert flat.num_rows == n_words == 7
    assert flat.column("word").to_pylist()[:2] == ["Hello", "world"]


def test_layout_geometry_exact_origins_and_estimated_extents():
    """Line origins come EXACTLY from the content stream's Td operands
    (fixtures: '72 720 Td' then '0 -14 Td' per line); word extents use
    the documented 0.5 em/char estimate; page dims from /MediaBox."""
    from deed_ocr_ray.stages.pdf_extract import parse_pdf_layout

    pdf = make_pdf([["Hello world line one", "Second line here"]], compress=True)
    (page,) = parse_pdf_layout(pdf)
    assert (page["width"], page["height"]) == (612.0, 792.0)
    (block,) = page["blocks"]
    l1, l2 = block["lines"]
    assert l1["bbox"][:2] == [72.0, 720.0]      # exact Td origin
    assert l2["bbox"][:2] == [72.0, 720.0 - 14]  # relative Td move
    # word extents: 0.5 em * 12pt = 6pt per char, single joining space
    w = l1["words"][0]
    assert w["bbox"] == [72.0, 720.0, 72.0 + 6.0 * len("Hello"), 732.0]
    w2 = l1["words"][1]
    assert w2["bbox"][0] == 72.0 + 6.0 * (len("Hello") + 1)
    # nesting invariant: every word bbox inside its line, line inside block
    for ln in block["lines"]:
        for wd in ln["words"]:
            assert ln["bbox"][0] <= wd["bbox"][0] <= wd["bbox"][2] <= ln["bbox"][2]
        assert block["bbox"][0] <= ln["bbox"][0]
        assert block["bbox"][3] >= ln["bbox"][3]
    # bbox inside the page
    assert 0 <= block["bbox"][0] and block["bbox"][2] <= page["width"]
    assert 0 <= block["bbox"][1] and block["bbox"][3] <= page["height"]


def test_layout_flattened_carries_bbox_columns(ray_session):
    import pyarrow as pa

    from deed_ocr_ray.stages.pdf_extract import PdfLayoutStage

    pdf = make_pdf([["Alpha beta"]])
    batch = pa.table({
        "url": pa.array(["u"], type=pa.string()),
        "html": pa.array([pdf], type=pa.binary()),
    })
    flat = PdfLayoutStage(flatten=True)(batch)
    for col in ("x1", "y1", "x2", "y2", "page_width", "page_height"):
        assert col in flat.column_names
    rows = flat.to_pylist()
    assert rows[0]["x1"] == 72.0 and rows[0]["y1"] == 720.0
    assert all(r["x2"] > r["x1"] and r["y2"] > r["y1"] for r in rows)
    assert all(r["page_width"] == 612.0 and r["page_height"] == 792.0 for r in rows)
