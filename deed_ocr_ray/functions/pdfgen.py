"""Deterministic minimal PDF writer for fixtures.

Produces small, valid PDF 1.4 files (uncompressed or Flate-compressed
content streams, proper xref table) — the fixture analogue of the
reference's golden scanned-deed inputs (test/1460797.pdf,
test/3917312-1.pdf). Each page's text is a list of lines rendered as one
``Tj`` per line, which is exactly the shape the parser in
``stages/pdf_extract.py`` reconstructs.
"""

from __future__ import annotations

import zlib
from typing import List, Sequence


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(lines: Sequence[str]) -> bytes:
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i > 0:
            ops.append("0 -14 Td")
        ops.append(f"({_esc(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1", errors="replace")


def make_pdf(pages: List[Sequence[str]], compress: bool = False) -> bytes:
    """Build a PDF whose page ``i`` shows ``pages[i]`` as text lines."""
    n_pages = len(pages)
    # object ids: 1 catalog, 2 pages, 3 font, then (page, content) pairs
    objs: List[bytes] = []
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, lines in enumerate(pages):
        page_id = 4 + 2 * i
        content_id = page_id + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> /Contents {content_id} 0 R >>"
            ).encode()
        )
        data = _content_stream(lines)
        if compress:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objs.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for oid, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{oid} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    n_objs = len(objs) + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def truncate_pdf(pdf: bytes, keep_fraction: float = 0.12) -> bytes:
    """Valid header, truncated body — the fixture's ``pdf_truncated`` class."""
    keep = max(8, int(len(pdf) * keep_fraction))
    return pdf[:keep]
