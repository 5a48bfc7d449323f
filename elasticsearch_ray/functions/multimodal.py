"""Multimodal column stages: image/audio/video as opaque `binary` columns with
typed metadata.

The decode kernels themselves are STUBBED (the image/audio libraries are not
in this container — each stage raises NotImplementedError unless
`fake=True`, which substitutes a deterministic fake decoder), but the
Ray-side plumbing is real and tested: schema contracts, actor-pool stages
with per-actor setup, bounded batch sizes for large binary payloads, and
typed Arrow outputs.

Schema contract: media tables carry (id:int64, media:binary,
media_type:string, width/height or sample_rate metadata columns as available).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("media", pa.binary()),
        ("media_type", pa.string()),
    ]
)


def make_fake_media_table(n: int, kind: str = "image", seed: int = 0,
                          payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng([seed, n])
    blobs = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
             for _ in range(n)]
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "media": pa.array(blobs, pa.binary()),
        "media_type": pa.array([kind] * n, pa.string()),
    })


class ImageDecodeStage:
    """binary -> (id, width, height, mean_pixel) — decode via PIL/turbojpeg in
    a real deployment; here a deterministic fake or NotImplementedError.

    Deploy as `map_batches(ImageDecodeStage, concurrency=N, batch_size=64)` —
    batch_size kept small because each row may be megabytes of pixels."""

    OUTPUT_SCHEMA = pa.schema([
        ("id", pa.int64()), ("width", pa.int32()), ("height", pa.int32()),
        ("mean_pixel", pa.float32()),
    ])

    def __init__(self, fake: bool = False):
        self.fake = fake
        # real deployment: self.decoder = turbojpeg.TurboJPEG() — once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/turbojpeg (not in this container); "
                "pass fake=True for the deterministic fake decoder"
            )
        ids = t["id"].to_numpy()
        widths, heights, means = [], [], []
        for blob in t["media"].to_pylist():
            b = np.frombuffer(blob, dtype=np.uint8)
            widths.append(64 + int(b[0]) % 64)
            heights.append(64 + int(b[1]) % 64)
            means.append(float(b.mean()))
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "mean_pixel": pa.array(np.asarray(means, np.float32)),
        })


class ImageResizeStage:
    """(stub) resize to target; fake mode emits truncated payloads with the
    target dims in metadata — exercises the binary-out schema path."""

    def __init__(self, width: int = 224, height: int = 224, fake: bool = False):
        self.width, self.height, self.fake = width, height, fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("resize requires an image library; use fake=True")
        out = [blob[: self.width * 4] for blob in t["media"].to_pylist()]
        return pa.table({
            "id": t["id"],
            "media": pa.array(out, pa.binary()),
            "media_type": t["media_type"],
            "width": pa.array([self.width] * len(t), pa.int32()),
            "height": pa.array([self.height] * len(t), pa.int32()),
        })


class AudioFeatureStage:
    """(stub) audio feature extraction: fake mode computes byte-level energy
    stats standing in for e.g. log-mel features."""

    def __init__(self, frame: int = 1024, fake: bool = False):
        self.frame, self.fake = frame, fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("audio decode requires soundfile/librosa; use fake=True")
        feats = []
        for blob in t["media"].to_pylist():
            b = np.frombuffer(blob, dtype=np.uint8).astype(np.float32)
            n = (b.size // self.frame) * self.frame
            frames = b[:n].reshape(-1, self.frame)
            feats.append(frames.mean(axis=1)[:16].tolist())
        return pa.table({
            "id": t["id"],
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


class VideoFrameSampleStage:
    """(stub) frame sampling: fake mode slices the payload into `n_frames`
    pseudo-frames — exercises the one-to-many (flat) output layout."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames, self.fake = n_frames, fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("video decode requires ffmpeg; use fake=True")
        ids, fidx, frames = [], [], []
        for i, blob in zip(t["id"].to_pylist(), t["media"].to_pylist()):
            step = max(1, len(blob) // self.n_frames)
            for f in range(self.n_frames):
                ids.append(i)
                fidx.append(f)
                frames.append(blob[f * step : (f + 1) * step])
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })
