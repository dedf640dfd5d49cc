"""Block segmentation + classification truth table.

The engine-side analogue of the reference's parametrized pattern truth
table (test/test_legal_description_extraction.py:83-100): inputs that
must / must not contribute main content.
"""

import pytest

from deed_ocr_ray.functions.stopwords import stopwords_for
from deed_ocr_ray.stages.html_extract import extract_blocks, segment_html

EN = stopwords_for("en")

CONTENT = (
    "This is the main body of the article and it has plenty of the usual "
    "function words that a real paragraph of content would have in it."
)


def kept_texts(doc):
    kept, _ = extract_blocks(doc, EN)
    return [t for _, t, _ in kept]


def test_content_kept_nav_dropped():
    doc = (
        "<html><body><nav><ul><li><a href='/'>Home</a></li>"
        "<li><a href='/x'>About</a></li></ul></nav>"
        f"<main><p>{CONTENT}</p></main>"
        "<footer><p>Copyright 2024 <a href='/t'>Terms</a></p></footer></body></html>"
    )
    texts = kept_texts(doc)
    assert texts == [CONTENT]


def test_nav_only_zero_blocks_kept():
    doc = (
        "<html><body><nav><ul><li><a href='/'>Home</a></li>"
        "<li><a href='/a'>About us</a></li></ul></nav></body></html>"
    )
    assert kept_texts(doc) == []


def test_link_farm_dropped():
    farm = " | ".join(f"<a href='/t/{i}'>tag {i}</a>" for i in range(12))
    doc = f"<html><body><div>{farm}</div><p>{CONTENT}</p></body></html>"
    assert kept_texts(doc) == [CONTENT]


def test_heading_promoted_by_following_content():
    doc = f"<html><body><header><h1>The Title Here</h1></header><p>{CONTENT}</p></body></html>"
    kept, _ = extract_blocks(doc, EN)
    assert [k for k, _, _ in kept] == ["heading", "paragraph"]
    assert kept[0][1] == "The Title Here"


def test_heading_without_content_dropped():
    doc = "<html><body><h1>Lonely title</h1><nav><a href='/'>x</a></nav></body></html>"
    assert kept_texts(doc) == []


def test_short_block_smoothing():
    doc = (
        f"<html><body><p>{CONTENT}</p><p>Short note.</p>"
        f"<p>{CONTENT}</p></body></html>"
    )
    texts = kept_texts(doc)
    assert texts == [CONTENT, "Short note.", CONTENT]


def test_isolated_short_block_dropped():
    doc = "<html><body><div><a href='/'>m</a></div><p>Short note.</p></body></html>"
    assert "Short note." not in kept_texts(doc)


def test_script_style_raw_text_skipped():
    doc = (
        "<html><head><script>var a = '<p>fake</p>';</script>"
        "<style>p{color:red}</style></head>"
        f"<body><p>{CONTENT}</p></body></html>"
    )
    assert kept_texts(doc) == [CONTENT]


def test_unclosed_script_swallows_rest():
    doc = f"<html><body><p>{CONTENT}</p><script>var x=1;"
    assert kept_texts(doc) == [CONTENT]


def test_entities_unescaped():
    doc = f"<html><body><p>{CONTENT} &amp; more &#72;ere</p></body></html>"
    texts = kept_texts(doc)
    assert len(texts) == 1 and "& more Here" in texts[0]


def test_malformed_tags_are_tolerated():
    doc = f"<html><body></div></div><p>{CONTENT}<p>< not a tag. <b>{CONTENT}</b></body>"
    texts = kept_texts(doc)
    assert any(CONTENT in t for t in texts)


def test_total_on_garbage():
    for doc in ("", "<", "<<<>>>", "\x00\x01\x02", "<html", "plain text only"):
        blocks = segment_html(doc)
        assert isinstance(blocks, list)


def test_deterministic():
    from deed_ocr_ray.fixtures import gen_row

    r = gen_row(42, 40)  # html_messy
    doc = r["html"].decode("utf-8", errors="replace")
    a = extract_blocks(doc, EN)
    b = extract_blocks(doc, EN)
    assert a == b


@pytest.mark.parametrize(
    "lang,stop_hit",
    [("en", "the data of the table"), ("de", "die daten und der tisch"),
     ("id", "yang data dan untuk ini")],
)
def test_language_gate(lang, stop_hit):
    words = (stop_hit + " ") * 12
    doc = f"<html><body><p>{words.strip()}</p></body></html>"
    kept, _ = extract_blocks(doc, stopwords_for(lang))
    assert len(kept) == 1


def test_corpus_level_boilerplate_exclusion(ray_session, tmp_path):
    """Corpus-level quality audit over the frozen sf_test corpus: the
    footer boilerplate never leaks into any extracted_text, and the
    overwhelming majority of html_clean docs keep their <main> body."""
    import pyarrow.parquet as pq

    from deed_ocr_ray.fixtures import SF_TEST, write_pages_corpus
    from deed_ocr_ray.pipelines.extract_pipeline import run_extract

    corpus = str(tmp_path / "pages")
    write_pages_corpus(corpus, SF_TEST["n_rows"], seed=SF_TEST["seed"],
                       n_shards=SF_TEST["n_shards"],
                       giant_bytes=SF_TEST["giant_bytes"])
    out = str(tmp_path / "out")
    run_extract(corpus, out, files_per_part=3, wave_parts=None, concurrency=2)
    t = pq.read_table(out, columns=["url", "payload_kind", "status",
                                    "extracted_text", "n_kept"])
    texts = t.column("extracted_text").to_pylist()
    # footer/linkfarm exclusion: the copyright line is in EVERY html doc's
    # raw bytes but must never survive classification
    assert not any("Copyright 2024 Example Site" in x for x in texts)
    assert not any("Terms Privacy" in x for x in texts)
    # recall: html docs that extracted ok keep content
    kinds = t.column("payload_kind").to_pylist()
    status = t.column("status").to_pylist()
    ok_html = [x for x, k, s in zip(texts, kinds, status)
               if k == "html" and s == "ok"]
    assert ok_html
    non_trivial = sum(1 for x in ok_html if len(x) > 100)
    assert non_trivial / len(ok_html) > 0.9
