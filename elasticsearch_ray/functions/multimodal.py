"""Multimodal column stages: image/audio/video as opaque `binary` columns with
typed metadata.

The decode kernels are REAL for containerless formats parseable with numpy
alone — 24-bit uncompressed BMP images, 16-bit PCM WAV audio, and a
length-prefixed BMP frame-sequence "video" container (the webdataset-style
shard shape) — so decode / resize / feature-extract / frame-sample all do
actual pixel/sample work. Compressed codecs (JPEG/PNG/FLAC/H.264) would need
external libraries not present in this container; those paths raise
NotImplementedError with the library named, and the deterministic `fake`
decoders remain for plumbing tests with arbitrary bytes.

Schema contract: media tables carry (id:int64, media:binary,
media_type:string). Stages deploy as actor-pool map_batches with small
batch_size (rows may be megabytes of pixels):
    ds.map_batches(ImageDecodeStage, concurrency=N, batch_size=64)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("media", pa.binary()),
        ("media_type", pa.string()),
    ]
)


# ---------------- real codecs (numpy-only formats) ----------------


def bmp_encode(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a 24-bit BI_RGB BMP (bottom-up rows,
    4-byte row padding, BGR byte order) — the standard Windows DIB layout."""
    h, w, _ = rgb.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = np.zeros((h, row + pad), dtype=np.uint8)
    body[:, :row] = rgb[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    return header + dib + body.tobytes()


def bmp_decode(blob: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP into an (h, w, 3) uint8 RGB array."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    comp = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    body = np.frombuffer(blob, np.uint8, count=stride * h, offset=off)
    px = body.reshape(h, stride)[:, :row].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return px[::-1] if flip else px


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a PCM WAV (RIFF) blob."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 mono WAV blob -> (samples float32 in [-1,1], rate)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    # walk chunks to find fmt + data (robust to extra chunks)
    pos, rate, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack_from("<HHI", blob, pos + 8)
            if fmt != 1 or ch != 1:
                raise NotImplementedError("only PCM mono WAV supported")
        elif cid == b"data":
            data = np.frombuffer(blob, "<i2", count=size // 2, offset=pos + 8)
        pos += 8 + size + (size % 2)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data.astype(np.float32) / 32768.0, rate


VIDEO_MAGIC = b"BMSQ"  # length-prefixed BMP frame sequence container


def video_encode(frames: list[np.ndarray]) -> bytes:
    """Encode RGB frames as the BMSQ container: magic, count, then
    (length, BMP) records — the shard-of-frames layout."""
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        b = bmp_encode(f)
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def video_frame_offsets(blob: bytes) -> list[tuple[int, int]]:
    """(offset, length) of each frame record without decoding pixels."""
    if blob[:4] != VIDEO_MAGIC:
        raise ValueError("not a BMSQ payload")
    n = struct.unpack_from("<I", blob, 4)[0]
    out, pos = [], 8
    for _ in range(n):
        ln = struct.unpack_from("<I", blob, pos)[0]
        out.append((pos + 4, ln))
        pos += 4 + ln
    return out


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (index-map gather)."""
    h, w, _ = rgb.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return rgb[yi[:, None], xi[None, :]]


# ---------------- synthetic media generation ----------------


def make_fake_media_table(n: int, kind: str = "image", seed: int = 0,
                          payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake (arbitrary-bytes) media rows for plumbing tests."""
    rng = np.random.default_rng([seed, n])
    blobs = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
             for _ in range(n)]
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "media": pa.array(blobs, pa.binary()),
        "media_type": pa.array([kind] * n, pa.string()),
    })


def make_media_table(n: int, kind: str = "image", seed: int = 0) -> pa.Table:
    """Deterministic REAL media rows: BMP images (varying dims), PCM WAVs
    (varying tones), or BMSQ frame sequences."""
    rng = np.random.default_rng([seed, n])
    blobs = []
    for i in range(n):
        if kind == "image":
            w, h = 16 + int(rng.integers(0, 48)), 16 + int(rng.integers(0, 48))
            rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            blobs.append(bmp_encode(rgb))
        elif kind == "audio":
            secs = 0.05 + float(rng.random()) * 0.05
            t = np.arange(int(16000 * secs))
            freq = 100 + float(rng.random()) * 400
            s = (np.sin(2 * np.pi * freq * t / 16000) * 12000).astype(np.int16)
            blobs.append(wav_encode(s))
        elif kind == "video":
            frames = [rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
                      for _ in range(int(rng.integers(4, 9)))]
            blobs.append(video_encode(frames))
        else:
            raise ValueError(kind)
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "media": pa.array(blobs, pa.binary()),
        "media_type": pa.array([kind] * n, pa.string()),
    })


# ---------------- actor-pool stages ----------------


class ImageDecodeStage:
    """binary -> (id, width, height, mean_pixel). REAL decode for BMP
    payloads; `fake=True` keeps the arbitrary-bytes plumbing decoder; other
    codecs raise naming the needed library."""

    OUTPUT_SCHEMA = pa.schema([
        ("id", pa.int64()), ("width", pa.int32()), ("height", pa.int32()),
        ("mean_pixel", pa.float32()),
    ])

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy()
        widths, heights, means = [], [], []
        for blob in t["media"].to_pylist():
            if self.fake:
                b = np.frombuffer(blob, dtype=np.uint8)
                widths.append(64 + int(b[0]) % 64)
                heights.append(64 + int(b[1]) % 64)
                means.append(float(b.mean()))
                continue
            if blob[:2] != b"BM":
                raise NotImplementedError(
                    "only BMP decodes without external libraries; "
                    "JPEG/PNG need PIL or turbojpeg (absent in this container)"
                )
            rgb = bmp_decode(blob)
            heights.append(rgb.shape[0])
            widths.append(rgb.shape[1])
            means.append(float(rgb.mean()))
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "mean_pixel": pa.array(np.asarray(means, np.float32)),
        })


class ImageResizeStage:
    """REAL resize for BMP payloads: decode -> nearest-neighbor resample ->
    re-encode BMP. Output keeps the media schema plus target dims."""

    def __init__(self, width: int = 224, height: int = 224, fake: bool = False):
        self.width, self.height, self.fake = width, height, fake

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for blob in t["media"].to_pylist():
            if self.fake:
                out.append(blob[: self.width * 4])
                continue
            rgb = bmp_decode(blob)
            out.append(bmp_encode(resize_nearest(rgb, self.width, self.height)))
        return pa.table({
            "id": t["id"],
            "media": pa.array(out, pa.binary()),
            "media_type": t["media_type"],
            "width": pa.array([self.width] * len(t), pa.int32()),
            "height": pa.array([self.height] * len(t), pa.int32()),
        })


class AudioFeatureStage:
    """REAL feature extraction for PCM WAV: decode samples, frame them, emit
    per-frame RMS energy (first 16 frames) + duration."""

    def __init__(self, frame: int = 1024, fake: bool = False):
        self.frame, self.fake = frame, fake

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, durs = [], []
        for blob in t["media"].to_pylist():
            if self.fake:
                b = np.frombuffer(blob, dtype=np.uint8).astype(np.float32)
                n = (b.size // self.frame) * self.frame
                feats.append(b[:n].reshape(-1, self.frame).mean(axis=1)[:16].tolist())
                durs.append(float(b.size))
                continue
            samples, rate = wav_decode(blob)
            n = (samples.size // self.frame) * self.frame
            frames = samples[:n].reshape(-1, self.frame)
            rms = np.sqrt((frames * frames).mean(axis=1))
            feats.append(rms[:16].astype(np.float32).tolist())
            durs.append(float(samples.size) / rate)
        return pa.table({
            "id": t["id"],
            "features": pa.array(feats, pa.list_(pa.float32())),
            "duration_s": pa.array(np.asarray(durs, np.float64)),
        })


class VideoFrameSampleStage:
    """REAL frame sampling for the BMSQ container: read frame offsets from
    the header, slice `n_frames` evenly-spaced frames WITHOUT decoding
    unsampled ones, emit one row per sampled frame (one-to-many layout)."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames, self.fake = n_frames, fake

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for i, blob in zip(t["id"].to_pylist(), t["media"].to_pylist()):
            if self.fake:
                step = max(1, len(blob) // self.n_frames)
                for f in range(self.n_frames):
                    ids.append(i)
                    fidx.append(f)
                    frames.append(blob[f * step : (f + 1) * step])
                continue
            offs = video_frame_offsets(blob)
            pick = np.linspace(0, len(offs) - 1, min(self.n_frames, len(offs)),
                               dtype=np.int64)
            for f in np.unique(pick):
                off, ln = offs[int(f)]
                ids.append(i)
                fidx.append(int(f))
                frames.append(blob[off : off + ln])
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })
