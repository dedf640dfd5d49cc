"""Payload-kind sniffing and deterministic charset handling.

The branch dispatch analogue of the reference's engine dispatch
(deed_ocr/cli.py:60-65 ``--ocr-engine`` + payload routing): one closed
``payload_kind`` per row decides which extractor branch runs.

Rules (fixed, part of the golden contract):
  * ``html`` empty/NULL and ``text`` non-empty  -> "text"
  * ``html`` empty/NULL and ``text`` empty      -> "empty"
  * ``html`` starts with ``%PDF``               -> "pdf"
  * anything else                               -> "html" (the tolerant
    HTML branch absorbs non-HTML bytes; heavy mojibake becomes an
    ``error`` row, never an exception)
"""

from __future__ import annotations

import codecs
import re
from typing import Optional, Tuple

PDF_MAGIC = b"%PDF"

_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)", re.IGNORECASE)

# Fraction of U+FFFD replacement chars above which a decoded payload is
# classified as binary junk (error_type="decode_error").
JUNK_REPLACEMENT_RATIO = 0.20


def sniff_kind(html: Optional[bytes], text: Optional[str]) -> str:
    if not html:
        return "text" if text else "empty"
    if html[:4] == PDF_MAGIC:
        return "pdf"
    return "html"


def decode_html(raw: bytes) -> Tuple[str, float]:
    """Decode HTML payload bytes deterministically.

    Ladder (analogue of the reference's parse→repair→fallback ladder,
    deed_ocr/ocr/gemini_ocr.py:160-196 — total, never raises):
      1. UTF-8 BOM -> utf-8-sig;
      2. strict UTF-8;
      3. ``charset=`` sniffed from the first 2048 bytes, if the codec
         resolves;
      4. UTF-8 with replacement.

    Returns ``(text, replacement_ratio)``; a high ratio marks binary junk.
    """
    if raw[:3] == b"\xef\xbb\xbf":
        s = raw.decode("utf-8-sig", errors="replace")
        return s, _bad_ratio(s)
    try:
        return raw.decode("utf-8"), 0.0
    except UnicodeDecodeError:
        pass
    m = _CHARSET_RE.search(raw[:2048])
    if m:
        name = m.group(1).decode("ascii", errors="replace").lower()
        if name not in ("utf-8", "utf8"):
            try:
                codec = codecs.lookup(name)
                s = raw.decode(codec.name, errors="replace")
                return s, _bad_ratio(s)
            except LookupError:
                pass
    s = raw.decode("utf-8", errors="replace")
    return s, _bad_ratio(s)


def _bad_ratio(s: str) -> float:
    if not s:
        return 0.0
    return s.count("�") / len(s)
