"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages. The decode kernels themselves are
STUBS in this environment (no image/audio libraries exist in the
container): ``require_real_codecs=True`` raises ``NotImplementedError``
at the stub boundary, while the default deterministic fake decoder
exercises the REAL Ray-side plumbing — schema, batch sizing for fat
binary rows, actor signature, output layout — which is the part the
engine owns (the reference's analogue: rasterizer/OCR engines behind
factory seams, deed_ocr/utils/pdf_converter.py:17-26,
deed_ocr/ocr/vision_ocr.py:24-46).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import pyarrow as pa
import ray.data

MEDIA_META_TYPE = pa.struct(
    [
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("bytes", pa.int64()),
        ("sha1", pa.string()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: metadata derived purely from the
    payload bytes (stable across runs/platforms)."""
    h = hashlib.sha1(payload).digest()
    return {
        "format": ["png", "jpeg", "webp", "tiff"][h[0] % 4],
        "width": 64 + (h[1] % 64) * 16,
        "height": 64 + (h[2] % 64) * 16,
        "n_frames": 1 + h[3] % 4,
        "bytes": len(payload),
        "sha1": h.hex(),
    }


class MediaDecoder:
    """Actor-pool decode stage: binary column in, metadata struct out.

    Keep ``batch_size`` SMALL for fat binary rows (payload × batch ×
    concurrency must fit the worker heap); the pipeline builder below
    defaults to 32 rows/batch for exactly that reason.
    """

    def __init__(self, payload_column: str = "payload",
                 require_real_codecs: bool = False) -> None:
        self.payload_column = payload_column
        self.require_real_codecs = require_real_codecs
        if require_real_codecs:
            # the stub boundary: a real deployment plugs PIL/ffmpeg here
            raise NotImplementedError(
                "no image/audio codecs available in this environment; "
                "run with require_real_codecs=False for the deterministic stub"
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        metas = [
            _fake_decode(p if p is not None else b"")
            for p in t[self.payload_column].to_pylist()
        ]
        return t.drop_columns([self.payload_column]).append_column(
            "media_meta", pa.array(metas, type=MEDIA_META_TYPE)
        )


class FrameSampler:
    """Actor-pool frame-sampling stage (video analogue of the PDF
    page-explode S2): emits one row per sampled frame index, payload
    replaced by a per-frame sha1 (the stub 'decoded frame')."""

    def __init__(self, every_n: int = 1) -> None:
        self.every_n = max(1, every_n)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, keys = [], [], []
        metas = t["media_meta"].to_pylist()
        id_col = t["doc_id"].to_pylist()
        for did, m in zip(id_col, metas):
            for f in range(0, m["n_frames"], self.every_n):
                ids.append(did)
                frames.append(f)
                keys.append(hashlib.sha1(f"{m['sha1']}:{f}".encode()).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(frames, type=pa.int32()),
            "frame_key": pa.array(keys, type=pa.string()),
        })


def q_media_pipeline(sf_dir: str) -> "ray.data.Dataset":
    """Media plumbing demo over documents-as-payloads: text bytes stand
    in for an image column; decode (stub) then frame-sample.
    Columns: doc_id, frame_idx, frame_key. (No SQL oracle: stubbed
    decode.)"""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "payload": t["text"].cast(pa.binary()),
        }),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(MediaDecoder, batch_format="pyarrow",
                        batch_size=32, concurrency=(1, 4))
    return ds.map_batches(FrameSampler, fn_constructor_kwargs={"every_n": 2},
                          batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
