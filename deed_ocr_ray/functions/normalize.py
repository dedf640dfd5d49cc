"""Deterministic text normalization — part of the byte-identity contract.

Re-expresses the reference's post-processing exactly (observable
semantics, including its quirks):

* ordered literal watermark replaces — deed_ocr/workflow.py:711-720
  (note: the reference replaces "UNOFFICIAL COPY" *before* the doubled
  form, so the doubled-form replace never fires on its own; and the bare
  "UNO" partial-watermark replace applies to any occurrence. We preserve
  that observable order.)
* then ``\\n\\s*\\n\\s*\\n`` -> ``\\n\\n`` (single pass, leftmost
  non-overlapping, like ``re.sub``) — deed_ocr/workflow.py:724
* then ``' +'`` -> ``' '`` — deed_ocr/workflow.py:725
* then ``str.strip()`` — deed_ocr/workflow.py:726

``normalize_text`` is the one canonical entry point; all extractor
branches must emit text for which ``normalize_text`` is idempotent (the
e2e tests assert this), so span offsets computed at assembly time remain
valid on the final string (SURVEY.md §7.4 risk 2).
"""

from __future__ import annotations

import re
from typing import List, Tuple

# Observable order from deed_ocr/workflow.py:713-717.
WATERMARKS: Tuple[str, ...] = (
    "UNOFFICIAL COPY",
    "UNOFFICIAL COPY UNOFFICIAL COPY",
    "UNO",
)

_EXCESS_NEWLINES = re.compile(r"\n\s*\n\s*\n")
_MULTI_SPACE = re.compile(r" +")
_WS_RUN = re.compile(r"\s+")


def strip_watermarks(text: str) -> str:
    # All three literals contain "UNO": one cheap substring check proves
    # no replace can fire (byte-identical fast path).
    if "UNO" not in text:
        return text
    for wm in WATERMARKS:
        text = text.replace(wm, "")
    return text


def collapse_whitespace(text: str) -> str:
    """The reference's two-regex collapse + strip (workflow.py:724-726)."""
    text = _EXCESS_NEWLINES.sub("\n\n", text)
    text = _MULTI_SPACE.sub(" ", text)
    return text.strip()


def normalize_text(text: str) -> str:
    """Full normalization contract: watermarks, then whitespace, then strip."""
    return collapse_whitespace(strip_watermarks(text))


def fixpoint_normalize(text: str, max_passes: int = 8) -> str:
    """Iterate :func:`normalize_text` to a fixed point.

    The reference's newline collapse is a single ``re.sub`` pass
    (workflow.py:724) and therefore not idempotent on e.g. five
    consecutive newlines. Our engine's contract is that
    ``extracted_text`` is a *fixed point* of ``normalize_text`` (so span
    offsets computed at assembly time stay valid); branches whose
    assembly already guarantees the fixed point pay one verification
    pass here.
    """
    for _ in range(max_passes):
        nxt = normalize_text(text)
        if nxt == text:
            return text
        text = nxt
    return text


def normalize_inline(text: str) -> str:
    """Normalize a single block's text to one line.

    Collapse ALL whitespace runs (incl. newlines) to single spaces, then
    strip watermarks, then collapse again (watermark removal can join
    neighbors into a double space), then strip. Order matters: the
    watermark literals contain single spaces, so collapse must precede
    the strip; and because the bare ``"UNO"`` replace removes every
    ``UNO`` substring, no watermark literal can re-form afterwards — the
    result is watermark-free, which makes the assembled text (blocks
    joined by ``\\n\\n``) a fixed point of :func:`normalize_text`.

    Used for HTML block texts and PDF lines.

    Implementation note: ``" ".join(t.split())`` is byte-equivalent to
    ``_WS_RUN.sub(" ", t).strip()`` (runs of any whitespace -> single
    space, ends stripped) and runs in C; boundary spaces the regex form
    would keep are removed by the final strip either way, and literal
    watermark replaces cannot be affected by leading/trailing spaces.
    When no watermark fired, the first collapse's output is already the
    fixed point, so the second collapse is skipped.
    """
    text = " ".join(text.split())
    if "UNO" not in text:
        return text
    text = strip_watermarks(text)
    return " ".join(text.split())


def dedup_preserve_order(items: List[str]) -> List[str]:
    """Order-preserving exact dedup, skipping falsy items.

    Same semantics as the reference's ``_remove_duplicates_from_list``
    (deed_ocr/workflow.py:600-616): first occurrence wins, empty/None
    entries dropped.
    """
    seen = set()
    out: List[str] = []
    for it in items:
        if not it:
            continue
        if it not in seen:
            seen.add(it)
            out.append(it)
    return out
