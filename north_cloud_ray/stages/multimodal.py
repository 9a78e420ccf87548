"""Multimodal (image/audio/video) stages — binary columns with typed
metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``decode_backend``: 'fake' (default) produces deterministic
pseudo-decodes from the payload hash so the Ray-side plumbing — schemas,
actor-pool batching, memory sizing — is real and testable; 'real' raises
NotImplementedError with the library that would be used.

Design notes for 100 TB of media:
- media rows are wide: keep ``batch_size`` small (64 here vs thousands for
  text) so batch x concurrency fits worker heaps; blocks of binary columns
  should flow as Arrow binary arrays (zero-copy), never pandas object dtype.
- decode/feature-extract are actor pools (model/codec loaded once per
  actor in __init__), the canonical A6 pattern.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("doc_id", pa.string()),
        ("media_type", pa.string()),   # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),      # opaque encoded bytes
        ("byte_len", pa.int64()),
    ]
)

IMAGE_FEATURE_DIM = 16


def synth_media_table(media_refs: list[tuple[str, str]], seed: int = 42) -> pa.Table:
    """Deterministic fake media payloads for (doc_id, media_ref) pairs —
    stands in for fetching the binary objects referenced by media spans."""
    ids, docs, types, payloads, lens = [], [], [], [], []
    for doc_id, ref in media_refs:
        h = hashlib.sha256(f"{seed}:{ref}".encode()).digest()
        size = 64 + h[0] * 4
        payload = (h * ((size // len(h)) + 1))[:size]
        ids.append(hashlib.sha256(ref.encode()).hexdigest()[:16])
        docs.append(doc_id)
        types.append("image")
        payloads.append(payload)
        lens.append(len(payload))
    return pa.Table.from_arrays(
        [
            pa.array(ids), pa.array(docs), pa.array(types),
            pa.array(payloads, type=pa.binary()), pa.array(lens, type=pa.int64()),
        ],
        schema=MEDIA_SCHEMA,
    )


class ImageDecodeActor:
    """Decode + resize + feature-extract for image payloads.

    'fake' backend derives (width, height), a resized thumbnail digest and
    an IMAGE_FEATURE_DIM float feature vector deterministically from the
    payload bytes. 'real' backend would use PIL/OpenCV — not available in
    this container.
    """

    def __init__(self, decode_backend: str = "fake", target_size: int = 64):
        if decode_backend not in ("fake", "real"):
            raise ValueError(decode_backend)
        if decode_backend == "real":
            raise NotImplementedError(
                "real image decode requires PIL/opencv; not present in this "
                "sandbox — use decode_backend='fake'"
            )
        self.backend = decode_backend
        self.target = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, thumbs, feats = [], [], [], []
        for payload in batch["payload"].to_pylist():
            h = hashlib.sha256(payload).digest()
            widths.append(160 + h[1] * 8)
            heights.append(120 + h[2] * 8)
            thumbs.append(hashlib.sha256(payload + b"|thumb").digest()[:16])
            rng = np.frombuffer(h + hashlib.sha256(h).digest(), dtype=np.uint8)
            feats.append((rng[:IMAGE_FEATURE_DIM] / 255.0).astype(np.float32))
        out = batch.drop_columns(["payload"])  # decoded stages drop raw bytes
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        out = out.append_column("thumb_digest", pa.array(thumbs, type=pa.binary()))
        out = out.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32()))
        )
        return out


def decode_images(media_ds, concurrency: int = 2, batch_size: int = 64,
                  decode_backend: str = "fake"):
    """Actor-pool decode stage; small batches because rows are wide."""
    return media_ds.map_batches(
        ImageDecodeActor,
        fn_constructor_args=(decode_backend,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class AudioFrameSampleActor:
    """Frame-sampling stub for audio/video payloads: emits n_frames sample
    digests per row (flat_map shape: one row per sampled frame)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idx, digests = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            for i in range(self.n_frames):
                media_ids.append(mid)
                frame_idx.append(i)
                digests.append(
                    hashlib.sha256(payload + i.to_bytes(4, "big")).digest()[:8]
                )
        return pa.Table.from_arrays(
            [pa.array(media_ids), pa.array(frame_idx, type=pa.int32()),
             pa.array(digests, type=pa.binary())],
            names=["media_id", "frame_idx", "frame_digest"],
        )
