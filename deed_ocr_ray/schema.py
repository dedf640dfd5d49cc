"""Arrow schemas for the engine's input and output tables.

Input ``pages`` table shape is fixed by BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``.

Output ``extracted`` table is the columnar analogue of the reference's
per-document ``final_result.json`` (reference: deed_ocr/workflow.py:25-37
``SimplifiedDeedResult``): fixed envelope columns plus a closed ``fields``
struct replacing the reference's dynamic details dict (dynamic keys are
incompatible with a byte-stable columnar contract).
"""

from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("score", pa.float32()),
    ]
)

# Closed analogue of the reference's dynamic `details` dict
# (deed_ocr/ocr/gemini_ocr.py:413-419 page fields; :544-554 doc fields).
FIELDS_TYPE = pa.struct(
    [
        ("title", pa.string()),
        ("legal_description_block", pa.list_(pa.string())),
        ("trs", pa.list_(pa.string())),
        ("reserve_retain", pa.list_(pa.string())),
        ("oil_mineral", pa.list_(pa.string())),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("payload_kind", pa.string()),  # "html" | "pdf" | "text" | "empty"
        ("extracted_text", pa.large_string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("fields", FIELDS_TYPE),
        ("n_blocks", pa.int32()),
        ("n_kept", pa.int32()),
        ("n_chars", pa.int64()),
        ("status", pa.string()),  # "ok" | "error"
        ("error_type", pa.string()),  # "" when ok
        ("extract_us", pa.int64()),  # per-row extraction wall micros (non-deterministic)
        ("part_id", pa.int32()),  # checkpoint partition id
    ]
)

# Columns that participate in the byte-identity golden contract
# (everything except timing / partition bookkeeping).
DETERMINISTIC_COLUMNS = [
    "url",
    "warc_ts",
    "lang",
    "payload_kind",
    "extracted_text",
    "spans",
    "fields",
    "n_blocks",
    "n_kept",
    "n_chars",
    "status",
    "error_type",
]
