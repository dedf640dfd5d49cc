"""Regex field extraction with char spans, confidence scoring and in-row dedup.

Re-expresses (from scratch, equivalent coverage — not copied):

* pattern-set span extraction — analogue of deed_ocr/extractors/regex.py:7-53
  (lot/block, section-township-range, metes-and-bounds, legal-desc header);
* confidence scorer — semantics of deed_ocr/extractors/llm.py:143-165
  (base 0.5; +0.2 if within 500 chars of a header keyword, symmetric
  window around the header start; +0.1 if match length > 100; +0.1 if
  > 200; capped at 0.9);
* text similarity — semantics of deed_ocr/extractors/llm.py:195-217
  (lowercase+strip both, then exact → 1.0, containment → 0.9, else
  word-set Jaccard);
* near-dup suppression — semantics of deed_ocr/extractors/llm.py:167-193
  (sort by confidence desc, greedily keep unless similarity > 0.8 with an
  already-kept item);
* keyword-sentence extraction (reserve/retain, oil/mineral) — the
  deterministic stand-in for the reference's LLM-extracted sentence lists
  (deed_ocr/ocr/gemini_ocr.py:413-419 ``reserve_retain`` / ``oil_mineral``).

Everything here operates on the FINAL normalized text, so emitted offsets
index directly into ``extracted_text`` (SURVEY.md §7.4 canonical order).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

# --- patterns (own formulations; coverage mirrors extractors/regex.py) ---

RE_LOT_BLOCK = re.compile(
    r"Lot\s+\d+[A-Z]?\s*,?\s*Block\s+[0-9A-Z]+\s*,?\s*(?:of\s+)?"
    r"[A-Z][A-Z '&-]*(?:SUBDIVISION|ADDITION|ESTATES?|PLAT)",
    re.IGNORECASE,
)

RE_TRS = re.compile(
    r"(?:(?:N|S|E|W|NE|NW|SE|SW)\s*1/[24]\s+of\s+)?"
    r"Section\s+\d+\s*,?\s*Township\s+\d+\s*(?:North|South|[NS])\s*,?\s*"
    r"Range\s+\d+\s*(?:East|West|[EW])",
    re.IGNORECASE,
)

RE_METES_BOUNDS = re.compile(
    r"Beginning\s+at\s+(?:a\s+point\s+)?.{0,2000}?"
    r"(?:thence|containing).{0,2000}?(?:acres?|feet)",
    re.IGNORECASE | re.DOTALL,
)

RE_HEADER = re.compile(
    r"(?:LEGAL\s+DESCRIPTION|PROPERTY\s+DESCRIPTION|DESCRIBED\s+AS\s+FOLLOWS?):?",
    re.IGNORECASE,
)

RE_RESERVE = re.compile(r"\b(?:reserv(?:e|es|ed|ing|ation)|retain(?:s|ed|ing)?)\b", re.IGNORECASE)
RE_OIL_MINERAL = re.compile(r"\b(?:oil|gas|mineral(?:s)?|hydrocarbon(?:s)?)\b", re.IGNORECASE)

_SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+")

# (kind, pattern, gate) in fixed evaluation order — order is part of the
# contract. ``gate`` is a list of lowercase substrings the pattern REQUIRES
# (implied by the regex), so a failed cheap ``in`` check proves zero
# matches and skips the scan — results are byte-identical either way.
FIELD_PATTERNS: Tuple[Tuple[str, "re.Pattern[str]", Tuple[str, ...]], ...] = (
    ("lot_block", RE_LOT_BLOCK, ("lot", "block")),
    ("trs", RE_TRS, ("section", "township", "range")),
    ("metes_bounds", RE_METES_BOUNDS, ("beginning",)),
)

_HEADER_GATE = "descri"  # common to all RE_HEADER alternatives


def extract_field_spans(
    text: str, tl: Optional[str] = None
) -> List[Tuple[str, int, int, float]]:
    """All pattern matches over ``text`` as ``(kind, start, end, score)``.

    Matches are emitted in pattern order then position order (the
    reference iterates its pattern dict the same way,
    extractors/regex.py:48-52); scores via :func:`confidence`.
    ``tl`` optionally shares an already-lowercased copy of ``text``.
    """
    if tl is None:
        tl = text.lower()
    out: List[Tuple[str, int, int, float]] = []
    header_starts: List[int] = []
    header_done = False
    for kind, pat, gate in FIELD_PATTERNS:
        gate_ok = True
        for g in gate:  # explicit loop: no genexpr frame per pattern
            if g not in tl:
                gate_ok = False
                break
        if not gate_ok:
            continue
        if not header_done:  # lazily: only needed when something matches
            if _HEADER_GATE in tl:
                header_starts = [m.start() for m in RE_HEADER.finditer(text)]
            header_done = True
        for m in pat.finditer(text):
            out.append((kind, m.start(), m.end(), confidence(m.start(), m.end(), header_starts)))
    return out


def confidence(start: int, end: int, header_starts: List[int]) -> float:
    """deed_ocr/extractors/llm.py:143-165 scoring semantics (computed in
    integer tenths so 0.5+0.2+0.1+0.1 is exactly 0.9).

    The header boost is the reference's SYMMETRIC window:
    ``abs(match_pos - header_pos) < 500`` around the header START
    (llm.py:152-157). Two deliberate deviations from the reference:
    every header occurrence is considered (the reference's ``find()``
    only sees the first occurrence of each phrase), and ``match_pos``
    is the true span start (the reference's ``find(match_text)``
    misattributes the position when the matched text repeats)."""
    tenths = 5
    for hs in header_starts:
        if abs(start - hs) < 500:
            tenths += 2
            break
    n = end - start
    if n > 100:
        tenths += 1
    if n > 200:
        tenths += 1
    return min(tenths, 9) / 10.0


def text_similarity(a: str, b: str) -> float:
    """deed_ocr/extractors/llm.py:195-217 semantics: lowercase+strip
    both, then exact 1.0, containment 0.9, else word-set Jaccard."""
    a2, b2 = a.lower().strip(), b.lower().strip()
    if a2 == b2:
        return 1.0
    if a2 in b2 or b2 in a2:
        return 0.9
    wa, wb = set(a2.split()), set(b2.split())
    if not wa or not wb:
        return 0.0
    return len(wa & wb) / len(wa | wb)


def suppress_near_dups(
    cands: List[Tuple[str, float]], threshold: float = 0.8
) -> List[Tuple[str, float]]:
    """deed_ocr/extractors/llm.py:167-193 semantics: rank by score desc
    (stable on input order for ties), greedily keep items whose
    similarity to every kept item is <= threshold."""
    ranked = sorted(cands, key=lambda c: -c[1])
    kept: List[Tuple[str, float]] = []
    for text, score in ranked:
        if all(text_similarity(text, k) <= threshold for k, _ in kept):
            kept.append((text, score))
    return kept


# Substring gates for the keyword patterns: every regex alternative
# REQUIRES one of these lowercase substrings, so a failed memchr-speed
# ``in`` check over the (shared) lowercased text proves zero matches and
# skips the full regex scan entirely. Measured: the two full-text regex
# gate scans were ~25% of per-doc extraction CPU while matching on <20%
# of docs — the substring gate removes that scan for the rest.
RESERVE_GATE: Tuple[str, ...] = ("reserv", "retain")
OIL_MINERAL_GATE: Tuple[str, ...] = ("oil", "gas", "mineral", "hydrocarbon")


def keyword_sentences(
    text: str,
    pattern: "re.Pattern[str]",
    gates: Optional[Tuple[str, ...]] = None,
    tl: Optional[str] = None,
    parts: Optional[List[str]] = None,
) -> List[str]:
    """Sentences of ``text`` that match ``pattern`` (deterministic
    stand-in for the reference's LLM sentence lists).

    Scan ladder, cheapest first, every rung byte-identical in result:
    substring ``gates`` over the lowercased text (optional), one
    full-text regex search (the patterns are single words — no full-text
    match proves no sentence matches), then the sentence split (reuse
    via ``parts``) and per-sentence search."""
    if gates is not None:
        if tl is None:
            tl = text.lower()
        if not any(g in tl for g in gates):
            return []
    if not pattern.search(text):
        return []
    if parts is None:
        parts = _SENTENCE_SPLIT.split(text)
    return [s for s in parts if s and pattern.search(s)]
