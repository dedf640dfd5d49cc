"""Normalization contract tests (byte-exactness, reference semantics)."""

from deed_ocr_ray.functions.normalize import (
    collapse_whitespace,
    dedup_preserve_order,
    fixpoint_normalize,
    normalize_inline,
    normalize_text,
    strip_watermarks,
)


def test_watermark_order_matches_reference():
    # "UNOFFICIAL COPY" is replaced FIRST, so the doubled form collapses
    # to a stray space, and the bare "UNO" partial is removed last
    # (observable order of deed_ocr/workflow.py:713-720).
    assert strip_watermarks("aUNOFFICIAL COPYb") == "ab"
    assert strip_watermarks("UNOFFICIAL COPY UNOFFICIAL COPY") == " "
    assert strip_watermarks("xUNOy") == "xy"
    assert strip_watermarks("UNOBTAINABLE") == "BTAINABLE"


def test_collapse_matches_reference_single_pass():
    # greedy \s* eats any run: 5 newlines -> 2 in one pass (reference semantics)
    assert collapse_whitespace("a\n\n\n\n\nb") == "a\n\nb"
    assert collapse_whitespace("a\n\n\nb") == "a\n\nb"
    assert collapse_whitespace("a\n  \n  \nb") == "a\n\nb"
    assert collapse_whitespace("a   b") == "a b"
    assert collapse_whitespace("  a b  ") == "a b"


def test_fixpoint():
    for s in ("a\n\n\n\n\nb", "x  \n \n \n y UNOFFICIAL COPY z", "  spaced   out  "):
        out = fixpoint_normalize(s)
        assert normalize_text(out) == out


def test_normalize_inline_watermark_with_collapsed_space():
    # collapse happens before watermark strip, so "UNOFFICIAL  COPY"
    # (double space) is still removed, and no watermark can re-form.
    out = normalize_inline("x UNOFFICIAL  COPY y")
    assert out == "x y"
    assert "UNO" not in normalize_inline("a UNO UNOFFICIAL COPY b")


def test_normalize_inline_is_single_line():
    assert normalize_inline("a\nb  c\t d") == "a b c d"


def test_dedup_preserve_order():
    # first-occurrence-wins, falsy skipped (workflow.py:600-616)
    assert dedup_preserve_order(["b", "a", "", "b", None, "c", "a"]) == ["b", "a", "c"]


def test_canonicalize_url_contract():
    from deed_ocr_ray.functions.urlnorm import canonicalize_url as c

    assert c("HTTPS://WWW.Ex.COM:443/Docs/1/?utm_source=a&ref=x#frag") == \
        "https://www.ex.com/Docs/1/?ref=x"
    assert c("http://A.B:80/p/") == "http://a.b/p"
    assert c("http://a.b/") == "http://a.b/"  # lone root slash is kept
    assert c("http://a.b/p/") == "http://a.b/p"  # trailing path slash stripped
    assert c("http://a.b/p?utm_c=1") == "http://a.b/p"
    assert c("http://a.b/p?utm_c=1&utm_d=2&k=v") == "http://a.b/p?k=v"
    assert c("http://a.b:8080/p") == "http://a.b:8080/p"  # non-default port kept
    # port stripping is scheme-conditional: http://host:443 and
    # https://host:80 are DISTINCT origins and must survive
    assert c("http://a.b:443/p") == "http://a.b:443/p"
    assert c("https://a.b:80/p") == "https://a.b:80/p"
    assert c("HTTPS://A.B:443/p") == "https://a.b/p"
    assert c("HTTP://A.B:80/p") == "http://a.b/p"
    assert c("ftp://x/y#z") == "ftp://x/y"           # non-http: fragment only
    assert c("not a url") == "not a url"
