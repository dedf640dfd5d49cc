"""Deterministic tolerant HTML main-content extraction.

From-scratch single-pass tokenizer + jusText/Boilerpipe-style block
classifier (no external HTML library exists in this environment, and a
pinned in-repo parser is exactly what the byte-identity contract needs —
SURVEY.md §7.4 risk 1).

Computation re-expressed from the reference:
  * tolerant parse ladder that never throws and always yields a result —
    deed_ocr/ocr/gemini_ocr.py:160-196;
  * page -> ordered block segmentation with per-block metadata —
    deed_ocr/ocr/vision_ocr.py:278-354 (page→block→paragraph hierarchy);
  * per-block keep/drop using positional + keyword features —
    deed_ocr/models/layout.py:83-137 (boxes below headers, keyword
    containment) generalized to text-density / link-density / stop-word
    classification with context smoothing;
  * deterministic text assembly with char spans —
    deed_ocr/main.py:33-40 (LegalDescription start_char/end_char).

The classifier is a fixed-threshold cascade; thresholds are frozen
constants (part of the golden contract).
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass, field
from typing import FrozenSet, List, Tuple

from ..functions.normalize import normalize_inline
from ..functions.stopwords import stopword_ratio

# ---------------------------------------------------------------- tokenizer

TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>")
COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
DECL_RE = re.compile(r"<![^>]*>")
PI_RE = re.compile(r"<\?[^>]*>")

# Elements whose content is raw text per the HTML spec — skipped to the
# matching close tag (or EOF when unterminated: the tolerance rule).
RAW_TEXT = frozenset({"script", "style", "textarea", "title"})

# Containers whose text content never contributes to main content.
SKIP_CONTENT = frozenset(
    {"head", "noscript", "template", "iframe", "object", "embed", "applet",
     "select", "option", "datalist", "svg", "math", "audio", "video",
     "canvas", "map", "button"}
)

# Boilerplate ancestors: any text inside them is classified bad
# (generalizes layout.py:83-137 positional priors).
BOILER = frozenset({"nav", "aside", "footer", "header", "form", "menu"})

HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Opening OR closing one of these finalizes the current block.
BLOCK_BOUNDARY = frozenset(
    {"p", "div", "section", "article", "main", "body", "html", "ul", "ol",
     "li", "dl", "dt", "dd", "table", "thead", "tbody", "tfoot", "tr", "td",
     "th", "blockquote", "pre", "figure", "figcaption", "form", "fieldset",
     "hr", "br", "address", "center", "details", "summary", "caption"}
    | HEADINGS | BOILER
)

# Void elements never push ancestor state.
VOID = frozenset({"br", "hr", "img", "input", "meta", "link", "area", "base",
                  "col", "embed", "source", "track", "wbr"})


@dataclass
class Block:
    """One segmented text block with classification features."""
    parts: List[Tuple[str, bool]] = field(default_factory=list)  # (raw text, in_link)
    boiler: bool = False
    heading: bool = False
    # filled by finalize()
    text: str = ""
    link_chars: int = 0

    def finalize(self) -> bool:
        """Normalize part texts; returns True if the block is non-empty."""
        parts = self.parts
        self.text = normalize_inline("".join([p for p, _ in parts]))
        if not self.text:
            return False
        self.link_chars = 0
        for p, in_link in parts:
            if in_link:
                self.link_chars += len(normalize_inline(p))
        return True


def segment_html(doc: str) -> List[Block]:
    """Tokenize ``doc`` and return ordered, finalized, non-empty blocks.

    Total function: any byte soup yields a (possibly empty) block list.
    """
    # Strip comments / declarations / processing instructions; an
    # unterminated comment swallows the rest of the document (tolerance).
    # Each pass is gated by a memchr-speed substring check — sub() with
    # zero matches returns the input unchanged, so the gates are
    # byte-neutral and skip three full-document regex scans when the
    # construct is absent.
    if "<!--" in doc:
        doc = COMMENT_RE.sub(" ", doc)
        cut = doc.find("<!--")
        if cut != -1:
            doc = doc[:cut]
    if "<!" in doc:
        doc = DECL_RE.sub(" ", doc)
    if "<?" in doc:
        doc = PI_RE.sub(" ", doc)

    blocks: List[Block] = []
    cur = Block()
    skip_depth = 0
    boiler_depth = 0
    heading_depth = 0
    link_depth = 0
    pos = 0
    lower = None  # lazily lowered on the first raw-text element
    n = len(doc)

    def flush() -> None:
        # an empty current block carries no state (flags are only set
        # together with a part append), so skip the reallocation
        nonlocal cur
        if cur.parts:
            if cur.finalize():
                blocks.append(cur)
            cur = Block()

    def add_text(seg: str) -> None:
        if skip_depth > 0 or not seg:
            return
        txt = _htmlmod.unescape(seg)
        if not txt:
            return
        cur.parts.append((txt, link_depth > 0))
        if boiler_depth > 0:
            cur.boiler = True
        if heading_depth > 0:
            cur.heading = True

    while pos < n:
        m = TAG_RE.search(doc, pos)
        if m is None:
            add_text(doc[pos:])
            break
        if m.start() > pos:
            add_text(doc[pos:m.start()])
        closing, name, self_close = m.group(1, 2, 4)
        if not name.islower():  # tag names are usually lowercase already
            name = name.lower()
        pos = m.end()

        if not closing and name in RAW_TEXT:
            # skip raw text content to the matching close tag (or EOF)
            if lower is None:
                lower = doc.lower()
            end = lower.find("</" + name, pos)
            if end == -1:
                break
            gt = doc.find(">", end)
            pos = n if gt == -1 else gt + 1
            continue

        if name in BLOCK_BOUNDARY and cur.parts:
            flush()  # call-site parts check skips ~half the calls

        if name in VOID or self_close:
            continue
        if not closing:
            if name in SKIP_CONTENT:
                skip_depth += 1
            if name in BOILER:
                boiler_depth += 1
            if name in HEADINGS:
                heading_depth += 1
            if name == "a":
                link_depth += 1
        else:
            if name in SKIP_CONTENT and skip_depth > 0:
                skip_depth -= 1
            if name in BOILER and boiler_depth > 0:
                boiler_depth -= 1
            if name in HEADINGS and heading_depth > 0:
                heading_depth -= 1
            if name == "a" and link_depth > 0:
                link_depth -= 1
    flush()
    return blocks


# ------------------------------------------------------------- classifier

# Frozen thresholds — part of the golden contract.
MAX_LINK_DENSITY = 0.35
SHORT_LEN = 25
GOOD_SW_RATIO = 0.25
GOOD_MIN_LEN = 50
LONG_LEN = 150
LONG_SW_RATIO = 0.10

SCORE_GOOD = 0.9
SCORE_HEADING = 0.7
SCORE_SMOOTHED = 0.6

BAD, SHORT, NEAR, GOOD = 0, 1, 2, 3


def classify_block(b: Block, stop: FrozenSet[str]) -> int:
    """Fixed cascade: link density > heading > boilerplate ancestor >
    length/stop-word density (jusText-style). Headings are classified
    before the boilerplate-ancestor rule so a low-link-density ``<h1>``
    inside ``<header>`` (the canonical page title) stays promotable by
    the following content block."""
    total = len(b.text)
    if b.link_chars / total > MAX_LINK_DENSITY:
        return BAD
    if b.heading:
        return NEAR
    if b.boiler:
        return BAD
    if total < SHORT_LEN:
        return SHORT
    sw = stopword_ratio(b.text.lower().split(), stop)
    if sw >= GOOD_SW_RATIO and total >= GOOD_MIN_LEN:
        return GOOD
    if total >= LONG_LEN and sw >= LONG_SW_RATIO:
        return GOOD
    return NEAR


def smooth(base: List[int]) -> List[bool]:
    """Context smoothing, one deterministic left-to-right pass: a
    NEAR/SHORT block is kept iff its finalized left neighbor was kept or
    its raw right neighbor classifies GOOD (generalizes the reference's
    "boxes below headers" positional promotion, layout.py:108-119)."""
    kept: List[bool] = []
    for i, cls in enumerate(base):
        if cls == GOOD:
            kept.append(True)
        elif cls == BAD:
            kept.append(False)
        else:
            prev_kept = bool(kept) and kept[-1]
            next_good = i + 1 < len(base) and base[i + 1] == GOOD
            kept.append(prev_kept or next_good)
    return kept


def extract_blocks(doc: str, stop: FrozenSet[str]) -> Tuple[List[Tuple[str, str, float]], int]:
    """Segment + classify ``doc``.

    Returns ``(kept, n_blocks)`` where ``kept`` is an ordered list of
    ``(kind, text, score)`` with kind in {"heading", "paragraph"}.
    """
    blocks = segment_html(doc)
    base = [classify_block(b, stop) for b in blocks]
    keep = smooth(base)
    kept: List[Tuple[str, str, float]] = []
    for b, cls, k in zip(blocks, base, keep):
        if not k:
            continue
        if b.heading:
            kept.append(("heading", b.text, SCORE_HEADING))
        elif cls == GOOD:
            kept.append(("paragraph", b.text, SCORE_GOOD))
        else:
            kept.append(("paragraph", b.text, SCORE_SMOOTHED))
    return kept, len(blocks)
