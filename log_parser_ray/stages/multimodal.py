"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video travel the pipeline as ``binary`` columns plus metadata
(``mime``, ``width``/``height`` or ``sample_rate``, …). Decode / resize /
feature-extract are ACTOR-POOL ``map_batches`` stages: the (expensive) codec
or model loads once per actor in ``__init__``; ``__call__`` processes one
Arrow batch. Batches must be SMALL for large payloads — size
``batch_size`` so batch_bytes × concurrency fits the worker heap, and let
the object store spill the rest.

Codec policy: ``DecodeFeatures`` and ``Resize`` carry a REAL Pillow path —
``image/*`` payloads are decoded/resampled with PIL when it is importable —
and a deterministic fake otherwise (md5-seeded feature vector / byte
striding) for non-image mimes, undecodable payloads, or a container without
pillow (this one). The Ray-side plumbing — schema, actor signature, batch
sizing, fixed-size-list output — is identical on both paths, and the real
path's wiring is pinned by tests that inject a stub decoder module.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

BLOB_SCHEMA = pa.schema(
    [
        ("blob_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_DIM = 16


def synth_blobs(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic binary column derived from document text (test stand-in
    for real image/audio payloads)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        return pa.table(
            {
                "blob_id": pa.array(ids, pa.int64()),
                "mime": pa.array(["application/x-fake-image"] * len(ids)),
                "payload": pa.array(payloads, pa.binary()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class DecodeFeatures:
    """Actor-pool stage: binary payload → FEATURE_DIM float32 feature vector.

    Usage::

        blobs.map_batches(DecodeFeatures, concurrency=4, batch_size=64,
                          num_cpus=1, batch_format="pyarrow")

    ``concurrency`` creates an actor pool; the decoder state is built once
    per actor here in ``__init__`` — never per batch.
    """

    def __init__(self):
        # codec loads once per actor; self._image is the PIL.Image MODULE
        # (or None without pillow) so tests can inject a stub decoder
        try:
            from PIL import Image

            self._image = Image
        except ImportError:
            self._image = None

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic fake: md5-seeded pseudo-features, unit-normalized
        h = hashlib.md5(payload).digest()
        seed = int.from_bytes(h[:4], "little")
        rs = np.random.RandomState(seed)
        v = rs.standard_normal(FEATURE_DIM).astype(np.float32)
        return v / np.linalg.norm(v)

    def _decode_one(self, payload: bytes, mime: str) -> np.ndarray:
        if self._image is not None and mime.startswith("image/"):
            try:
                import io

                img = self._image.open(io.BytesIO(payload))
                # grayscale 4×4 thumbnail = FEATURE_DIM raw pixel features,
                # unit-normalized (deterministic; no model dependency)
                side = int(FEATURE_DIM ** 0.5)
                img = img.convert("L").resize((side, side))
                v = np.asarray(img, dtype=np.float32).reshape(-1)[:FEATURE_DIM]
                n = float(np.linalg.norm(v))
                return v / n if n > 0 else v
            except Exception:
                pass  # undecodable payload → deterministic fake below
        return self._fake_features(payload)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = np.stack(
            [
                self._decode_one(p, m)
                for p, m in zip(t["payload"].to_pylist(), t["mime"].to_pylist())
            ]
        )
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), FEATURE_DIM
        )
        return pa.table(
            {
                "blob_id": t["blob_id"],
                "n_bytes": t["n_bytes"],
                "feature": feat_arr,
            }
        )


def blob_features(
    docs: "ray.data.Dataset", *, concurrency: int = 2, batch_size: int = 128
) -> "ray.data.Dataset":
    """documents → synthetic blobs → actor-pool feature extraction."""
    return synth_blobs(docs).map_batches(
        DecodeFeatures,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class Resize:
    """Actor-pool stage: binary payload → resized binary payload + new dims.

    ``image/*`` payloads resample through Pillow (PNG-encoded output) when
    it is importable; other mimes / undecodable payloads / a pillow-less
    container use the deterministic fake (payload reduction to
    width×height bytes). Plumbing — batch in/out schema, metadata columns,
    small batch sizing for large payloads — is identical on both paths."""

    def __init__(self, width: int = 64, height: int = 64):
        self.width = width
        self.height = height
        try:
            from PIL import Image

            self._image = Image
        except ImportError:
            self._image = None

    def _fake_resize(self, payload: bytes) -> bytes:
        target = self.width * self.height
        if len(payload) >= target:
            return payload[:target]
        reps = -(-target // max(1, len(payload)))
        return (payload * reps)[:target]

    def _resize_one(self, payload: bytes, mime: str) -> bytes:
        if self._image is not None and mime.startswith("image/"):
            try:
                import io

                img = self._image.open(io.BytesIO(payload))
                img = img.resize((self.width, self.height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()
            except Exception:
                pass
        return self._fake_resize(payload)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = [
            self._resize_one(p, m)
            for p, m in zip(t["payload"].to_pylist(), t["mime"].to_pylist())
        ]
        return pa.table(
            {
                "blob_id": t["blob_id"],
                "mime": t["mime"],
                "payload": pa.array(out, pa.binary()),
                "n_bytes": pa.array([len(p) for p in out], pa.int64()),
                "width": pa.array([self.width] * len(out), pa.int32()),
                "height": pa.array([self.height] * len(out), pa.int32()),
            }
        )


class FrameSample:
    """Actor-pool FLAT stage: one video-ish blob → n_frames frame rows.

    Output cardinality ≠ input cardinality (each blob explodes into frames)
    — map_batches handles that naturally since a batch maps to a table of
    any length. Frame extraction is stubbed as deterministic byte striding;
    a real decoder (pyav etc.) swaps into ``_frames_of``."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def _frames_of(self, payload: bytes) -> list[bytes]:
        if not payload:
            return [b""] * self.n_frames
        stride = max(1, len(payload) // self.n_frames)
        return [payload[i * stride : (i + 1) * stride] for i in range(self.n_frames)]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, fidx = [], [], []
        for bid, p in zip(t["blob_id"].to_pylist(), t["payload"].to_pylist()):
            for i, f in enumerate(self._frames_of(p)):
                ids.append(bid)
                fidx.append(i)
                frames.append(f)
        return pa.table(
            {
                "blob_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
                "n_bytes": pa.array([len(f) for f in frames], pa.int64()),
            }
        )


def resize_blobs(
    blobs: "ray.data.Dataset", *, width=64, height=64, concurrency=2, batch_size=64
) -> "ray.data.Dataset":
    return blobs.map_batches(
        Resize,
        fn_constructor_kwargs={"width": width, "height": height},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def sample_frames(
    blobs: "ray.data.Dataset", *, n_frames=4, concurrency=2, batch_size=64
) -> "ray.data.Dataset":
    return blobs.map_batches(
        FrameSample,
        fn_constructor_kwargs={"n_frames": n_frames},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
