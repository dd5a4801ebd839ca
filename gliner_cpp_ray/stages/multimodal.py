"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

The image/audio codec libraries are not available in this container, so
the DECODE step is stubbed (SURVEY-mandated pattern): ``RealDecoder``
raises ``NotImplementedError`` until a codec backend is installed, and
``FakeDecoder`` deterministically parses the synthetic payload header.
Everything around the stub — schemas, actor-pool signatures, batch
sizing for large binaries, per-frame explode — is real Ray plumbing and
is tested.

Synthetic payload layout (``make_fake_payload``):
``b"KGIM" | uint16 width | uint16 height | pixel bytes`` — enough to
exercise header parse, per-row feature extraction (byte histograms via
``np.frombuffer``, zero-copy), and frame sampling for "video" rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gliner_cpp_ray.stages.sizing import default_concurrency

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

_MAGIC = b"KGIM"


def make_fake_payload(rng: np.random.Generator, width: int, height: int,
                      n_frames: int = 1) -> bytes:
    pixels = rng.integers(0, 256, size=width * height * n_frames, dtype=np.uint8)
    header = (
        _MAGIC
        + int(width).to_bytes(2, "little")
        + int(height).to_bytes(2, "little")
    )
    return header + pixels.tobytes()


class RealDecoder:  # pragma: no cover - codec libs absent by design
    """Placeholder for a real codec backend (PIL / ffmpeg / soundfile).

    STUB: this container ships no image/audio libraries; install one and
    implement ``decode`` to return an ndarray per payload."""

    def decode(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "no codec backend available in this environment; "
            "use FakeDecoder for the deterministic synthetic payloads"
        )


class FakeDecoder:
    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] != _MAGIC:
            raise ValueError("bad magic; not a synthetic payload")
        w = int.from_bytes(payload[4:6], "little")
        h = int.from_bytes(payload[6:8], "little")
        pixels = np.frombuffer(payload, dtype=np.uint8, offset=8)
        return pixels.reshape(-1, h, w)  # [frames, h, w]


class MediaFeatureStage:
    """Actor-pool stage: payload -> 16-bin byte histogram feature vector.

    Run with SMALL ``batch_size`` — large binary rows mean a batch ×
    concurrency must still fit a worker heap:
    ``map_batches(MediaFeatureStage, batch_size=32,
    concurrency=default_concurrency(), batch_format="pyarrow")``.
    """

    def __init__(self, decoder: str = "fake"):
        self.decoder = FakeDecoder() if decoder == "fake" else RealDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            frames = self.decoder.decode(payload)
            hist, _ = np.histogram(frames, bins=16, range=(0, 256))
            feats.append((hist / max(1, frames.size)).astype(np.float32))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def byte_stats(batch: pa.Table, id_col: str = "media_id",
               payload_col: str = "payload") -> pa.Table:
    """Opaque-binary feature extraction: total bytes (vectorized Arrow
    kernel) + high-bit byte count (``np.frombuffer`` per payload,
    zero-copy — the same access pattern a codec/histogram stage uses).
    SQL-expressible, so the binary-column plumbing gets a driver
    oracle."""
    import pyarrow.compute as pc

    payloads = batch.column(payload_col)
    n_bytes = pc.binary_length(payloads).cast(pa.int64())
    hi = np.fromiter(
        (
            int((np.frombuffer(p, dtype=np.uint8) >= 128).sum())
            for p in payloads.to_pylist()
        ),
        dtype=np.int64,
        count=batch.num_rows,
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_bytes": n_bytes,
            "n_hi_bytes": pa.array(hi),
        }
    )


class FrameSampleStage:
    """Actor-pool explode stage: one output row per sampled frame."""

    def __init__(self, stride: int = 2, decoder: str = "fake"):
        self.stride = stride
        self.decoder = FakeDecoder() if decoder == "fake" else RealDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, frames_out = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            frames = self.decoder.decode(payload)
            for k in range(0, frames.shape[0], self.stride):
                mids.append(mid)
                fidx.append(k)
                frames_out.append(frames[k].tobytes())
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames_out, pa.binary()),
            }
        )
