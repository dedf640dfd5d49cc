"""Payload sniffing + charset ladder tests."""

from deed_ocr_ray.functions.sniff import decode_html, sniff_kind


def test_kinds():
    assert sniff_kind(None, "hello") == "text"
    assert sniff_kind(b"", "hello") == "text"
    assert sniff_kind(None, "") == "empty"
    assert sniff_kind(b"", None) == "empty"
    assert sniff_kind(b"%PDF-1.4 ...", "") == "pdf"
    assert sniff_kind(b"<html>", "") == "html"
    assert sniff_kind(b"\x00\x01junk", "") == "html"


def test_decode_utf8():
    s, bad = decode_html("héllo <b>wörld</b>".encode("utf-8"))
    assert s == "héllo <b>wörld</b>" and bad == 0.0


def test_decode_bom():
    s, _ = decode_html(b"\xef\xbb\xbfabc")
    assert s == "abc"


def test_decode_charset_sniff():
    raw = b'<meta charset="iso-8859-1"><p>caf\xe9</p>'
    s, bad = decode_html(raw)
    assert "caf\xe9" in s
    assert bad == 0.0


def test_decode_binary_junk_flagged():
    import random

    rng = random.Random(7)
    junk = bytes(rng.getrandbits(8) for _ in range(2000))
    s, bad = decode_html(junk)
    assert isinstance(s, str)
    assert bad > 0.2  # classified as junk downstream


def test_decode_never_raises():
    for raw in (b"", b"\xff\xfe\x00", b"\x80\x80\x80", b"ok"):
        s, bad = decode_html(raw)
        assert isinstance(s, str) and 0.0 <= bad <= 1.0
