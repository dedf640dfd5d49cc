"""Deterministic PDF layout-parse branch.

From-scratch minimal PDF text extractor (no PDF library exists in this
environment): recovers page objects, orders them by the ``/Kids`` array,
decodes (optionally Flate-compressed) content streams, and reconstructs
text from ``Tj`` / ``TJ`` show operators — the pdfminer-style
region-ordering analogue of the reference's page rasterize + per-page
OCR loop (deed_ocr/utils/pdf_converter.py:28-68 rasterizer;
deed_ocr/ocr/vision_ocr.py:208-276 per-page OCR fold).

Semantics carried over:
  * per-page fault absorption: an unparsable page contributes an empty
    page, never an exception (deed_ocr/workflow.py:262-282);
  * page texts are assembled with ``--- Page {n} ---`` separators
    (deed_ocr/workflow.py:220-221 convention);
  * zero recoverable pages from a ``%PDF`` payload -> error row with
    ``error_type="pdf_parse_error"`` (the retry_needed analogue).

Line texts are normalized via ``normalize_inline`` and pages contain only
single newlines between non-empty lines, so the assembled document is a
fixed point of ``normalize_text`` and span offsets stay valid.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ..functions.normalize import normalize_inline

OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b")
PAGES_TYPE_RE = re.compile(rb"/Type\s*/Pages\b")
KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
KID_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
FLATE_RE = re.compile(rb"/Filter\s*/FlateDecode")
STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.S)

BT_ET_RE = re.compile(rb"BT(.*?)ET", re.S)
# ( ... ) Tj   |   [ ... ] TJ   |   Td/TD/T*/' (line-advance markers)
SHOW_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(Tj|')"
    rb"|\[((?:\(((?:[^()\\]|\\.)*)\)|[^\]\(])*)\]\s*TJ"
    rb"|(T\*|Td|TD)",
    re.S,
)
IN_ARRAY_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}
_ESC_RE = re.compile(rb"\\([0-7]{1,3}|.)", re.S)


def _unescape_pdf_string(raw: bytes) -> str:
    def sub(m: "re.Match[bytes]") -> bytes:
        g = m.group(1)
        if g.isdigit() and all(c in b"01234567" for c in g):
            return bytes([int(g, 8) & 0xFF])
        return _ESCAPES.get(g, g)

    return _ESC_RE.sub(sub, raw).decode("latin-1", errors="replace")


def _stream_text(data: bytes) -> str:
    """Reconstruct text from one content stream's BT..ET show operators.

    A ``Td``/``TD``/``T*`` between show ops starts a new line; strings
    within one ``TJ`` array concatenate (kerning numbers ignored).
    """
    lines: List[str] = []
    cur: List[str] = []
    pending_newline = False
    for block in BT_ET_RE.finditer(data):
        for m in SHOW_RE.finditer(block.group(1)):
            if m.group(5) is not None:  # Td / TD / T*
                pending_newline = True
                continue
            if pending_newline and cur:
                lines.append("".join(cur))
                cur = []
            pending_newline = False
            if m.group(1) is not None:  # (..) Tj
                cur.append(_unescape_pdf_string(m.group(1)))
            elif m.group(3) is not None:  # [ .. ] TJ
                for s in IN_ARRAY_STR_RE.finditer(m.group(3)):
                    cur.append(_unescape_pdf_string(s.group(1)))
    if cur:
        lines.append("".join(cur))
    return "\n".join(lines)


def parse_pdf_pages(raw: bytes) -> Tuple[List[str], int]:
    """Extract ordered per-page texts from PDF bytes.

    Returns ``(page_texts, n_pages_declared)``. Total function: any input
    yields a (possibly empty) list. Page texts are normalized per line;
    empty lines dropped.
    """
    objs: Dict[int, bytes] = {}
    for m in OBJ_RE.finditer(raw):
        try:
            objs[int(m.group(1))] = m.group(2)
        except ValueError:  # pragma: no cover
            continue

    page_ids: List[int] = []
    declared = 0
    for oid, body in objs.items():
        if PAGES_TYPE_RE.search(body):
            km = KIDS_RE.search(body)
            if km:
                page_ids = [int(r.group(1)) for r in KID_REF_RE.finditer(km.group(1))]
            cm = re.search(rb"/Count\s+(\d+)", body)
            if cm:
                declared = int(cm.group(1))
            break
    if not page_ids:  # fallback: /Page objects in id order (tolerance)
        page_ids = sorted(
            oid for oid, body in objs.items()
            if PAGE_TYPE_RE.search(body) and not PAGES_TYPE_RE.search(body)
        )

    texts: List[str] = []
    for pid in page_ids:
        texts.append(_page_text(objs, pid))
    return texts, declared or len(texts)


def _page_stream(objs: Dict[int, bytes], page_oid: int) -> Optional[bytes]:
    """Decoded content-stream bytes of one page, or None on any fault."""
    body = objs.get(page_oid)
    if body is None:
        return None
    cm = CONTENTS_RE.search(body)
    if cm is None:
        return None
    cobj = objs.get(int(cm.group(1)))
    if cobj is None:
        return None
    sm = STREAM_RE.search(cobj)
    if sm is None:
        return None
    data = sm.group(1)
    if FLATE_RE.search(cobj):
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data


def _page_text(objs: Dict[int, bytes], page_oid: int) -> str:
    """Text of one page; absorbs every per-page failure into ''. """
    data = _page_stream(objs, page_oid)
    if data is None:
        return ""
    raw_text = _stream_text(data)
    lines = [normalize_inline(ln) for ln in raw_text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


# ----------------------------------------------------- layout hierarchy (M6)
#
# The reference's detailed OCR emits page→block→paragraph→word→symbol
# with per-node confidences (deed_ocr/ocr/vision_ocr.py:292-342). The
# deterministic parser analogue: page→block (one BT..ET text object)→
# line→word nested structs. Model confidences don't exist here, so each
# node carries a deterministic character-class confidence (alnum ratio,
# averaged upward) — the plumbing, nesting and per-node-score shape are
# the real thing; swap `_word_conf` for a model score when one exists.

LAYOUT_WORD_TYPE = pa.struct([("text", pa.string()), ("conf", pa.float64())])
LAYOUT_LINE_TYPE = pa.struct([
    ("text", pa.string()), ("conf", pa.float64()),
    ("words", pa.list_(LAYOUT_WORD_TYPE)),
])
LAYOUT_BLOCK_TYPE = pa.struct([
    ("text", pa.string()), ("conf", pa.float64()),
    ("lines", pa.list_(LAYOUT_LINE_TYPE)),
])
LAYOUT_PAGE_TYPE = pa.struct([
    ("page_number", pa.int32()), ("n_blocks", pa.int32()),
    ("blocks", pa.list_(LAYOUT_BLOCK_TYPE)),
])
LAYOUT_TYPE = pa.list_(LAYOUT_PAGE_TYPE)


def _word_conf(w: str) -> float:
    return round(sum(c.isalnum() for c in w) / len(w), 3) if w else 0.0


def _stream_layout(data: bytes) -> List[List[str]]:
    """Per-BT..ET-block normalized lines. Unlike :func:`_stream_text`
    (which lets show strings join across text objects — the canonical
    TEXT path, frozen by goldens), the layout view flushes at every
    block boundary: a BT..ET object IS the block node."""
    blocks: List[List[str]] = []
    for block in BT_ET_RE.finditer(data):
        lines: List[str] = []
        cur: List[str] = []
        pending = False
        for m in SHOW_RE.finditer(block.group(1)):
            if m.group(5) is not None:  # Td / TD / T*
                pending = True
                continue
            if pending and cur:
                lines.append("".join(cur))
                cur = []
            pending = False
            if m.group(1) is not None:
                cur.append(_unescape_pdf_string(m.group(1)))
            elif m.group(3) is not None:
                for s in IN_ARRAY_STR_RE.finditer(m.group(3)):
                    cur.append(_unescape_pdf_string(s.group(1)))
        if cur:
            lines.append("".join(cur))
        norm = [normalize_inline(ln) for ln in lines]
        norm = [ln for ln in norm if ln]
        if norm:
            blocks.append(norm)
    return blocks


def parse_pdf_layout(raw: bytes) -> List[Dict]:
    """Nested layout hierarchy from PDF bytes: one dict per page
    (``page_number``, ``n_blocks``, ``blocks`` → ``lines`` → ``words``,
    every node with ``text`` and ``conf``). Total function: any input
    yields a (possibly empty) list; an unparsable page yields a page
    node with zero blocks — per-page fault absorption like
    :func:`parse_pdf_pages`."""
    objs: Dict[int, bytes] = {}
    for m in OBJ_RE.finditer(raw):
        try:
            objs[int(m.group(1))] = m.group(2)
        except ValueError:  # pragma: no cover
            continue
    page_ids: List[int] = []
    for oid, body in objs.items():
        if PAGES_TYPE_RE.search(body):
            km = KIDS_RE.search(body)
            if km:
                page_ids = [int(r.group(1)) for r in KID_REF_RE.finditer(km.group(1))]
            break
    if not page_ids:
        page_ids = sorted(
            oid for oid, body in objs.items()
            if PAGE_TYPE_RE.search(body) and not PAGES_TYPE_RE.search(body)
        )

    pages: List[Dict] = []
    for pno, pid in enumerate(page_ids, start=1):
        data = _page_stream(objs, pid)
        block_lines = _stream_layout(data) if data is not None else []
        blocks = []
        for lines in block_lines:
            line_nodes = []
            for ln in lines:
                words = [{"text": w, "conf": _word_conf(w)} for w in ln.split()]
                line_conf = (
                    round(sum(w["conf"] for w in words) / len(words), 3)
                    if words else 0.0
                )
                line_nodes.append({"text": ln, "conf": line_conf, "words": words})
            block_conf = (
                round(sum(l["conf"] for l in line_nodes) / len(line_nodes), 3)
                if line_nodes else 0.0
            )
            blocks.append({
                "text": "\n".join(l["text"] for l in line_nodes),
                "conf": block_conf,
                "lines": line_nodes,
            })
        pages.append({
            "page_number": pno,
            "n_blocks": len(blocks),
            "blocks": blocks,
        })
    return pages


class PdfLayoutStage:
    """Actor-pool batch stage: pages table in → layout hierarchy out.

    ``flatten=False`` emits one row per input PDF with the full nested
    ``layout`` column (:data:`LAYOUT_TYPE` — the vision_ocr.py:292-342
    structure analogue). ``flatten=True`` explodes to one row per WORD
    (url, page_number, block_idx, line_idx, word_idx, word, word_conf,
    line_conf, block_conf) — the SQL-friendly projection. Non-PDF rows
    are dropped (this stage is the pdf-branch detail view; the
    dispatching Extractor remains the canonical path)."""

    def __init__(self, flatten: bool = True) -> None:
        self.flatten = flatten

    def __call__(self, t: pa.Table) -> pa.Table:
        urls: List[str] = []
        layouts: List[List[Dict]] = []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            if html is None or not bytes(html).startswith(b"%PDF"):
                continue
            urls.append(url)
            layouts.append(parse_pdf_layout(bytes(html)))
        if not self.flatten:
            return pa.table({
                "url": pa.array(urls, type=pa.string()),
                "layout": pa.array(layouts, type=LAYOUT_TYPE),
            })
        cols: Dict[str, List] = {k: [] for k in (
            "url", "page_number", "block_idx", "line_idx", "word_idx",
            "word", "word_conf", "line_conf", "block_conf")}
        for url, pages in zip(urls, layouts):
            for page in pages:
                for bi, block in enumerate(page["blocks"]):
                    for li, line in enumerate(block["lines"]):
                        for wi, word in enumerate(line["words"]):
                            cols["url"].append(url)
                            cols["page_number"].append(page["page_number"])
                            cols["block_idx"].append(bi)
                            cols["line_idx"].append(li)
                            cols["word_idx"].append(wi)
                            cols["word"].append(word["text"])
                            cols["word_conf"].append(word["conf"])
                            cols["line_conf"].append(line["conf"])
                            cols["block_conf"].append(block["conf"])
        return pa.table({
            "url": pa.array(cols["url"], type=pa.string()),
            "page_number": pa.array(cols["page_number"], type=pa.int32()),
            "block_idx": pa.array(cols["block_idx"], type=pa.int32()),
            "line_idx": pa.array(cols["line_idx"], type=pa.int32()),
            "word_idx": pa.array(cols["word_idx"], type=pa.int32()),
            "word": pa.array(cols["word"], type=pa.string()),
            "word_conf": pa.array(cols["word_conf"], type=pa.float64()),
            "line_conf": pa.array(cols["line_conf"], type=pa.float64()),
            "block_conf": pa.array(cols["block_conf"], type=pa.float64()),
        })


def assemble_pages(page_texts: List[str]) -> Tuple[str, List[Tuple[str, int, int, float]]]:
    """Join page texts with the reference's ``--- Page {n} ---`` headers
    (deed_ocr/workflow.py:220-221) and emit one char-span per page
    covering that page's body text in the assembled string."""
    parts: List[str] = []
    spans: List[Tuple[str, int, int, float]] = []
    pos = 0
    for i, ptext in enumerate(page_texts, start=1):
        header = f"--- Page {i} ---"
        block = header + ("\n" + ptext if ptext else "")
        if parts:
            pos += 2  # the "\n\n" joiner
        body_start = pos + len(header) + (1 if ptext else 0)
        spans.append(("page", body_start, body_start + len(ptext), 1.0))
        parts.append(block)
        pos += len(block)
    return "\n\n".join(parts), spans
