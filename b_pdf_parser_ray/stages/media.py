"""Multimodal stages: opaque binary media columns + typed metadata.

Images/audio/video ride the pipeline as ``binary`` payload columns with a
metadata struct — the engine never interprets bytes outside these stages
(the spans model stores only ``media_ref`` pointers; this module is where a
ref would be resolved against a payload table and processed).

Decode status per modality:

* **audio — REAL**: RIFF/WAV (PCM16) payloads decode through the stdlib
  ``wave`` codec (``_decode_wav``); ``synth_wav`` emits genuine WAV bytes,
  so the audio stage exercises an actual container format end to end.
* **image/video — stubbed**: PIL/ffmpeg are NOT in this container, so
  ``fake=True`` parses this module's deterministic synthetic payload
  format and ``fake=False`` raises ``NotImplementedError`` at the exact
  call site a real decoder would occupy.  Everything around the stub —
  schemas, actor signatures, batch sizing, numpy feature kernels, output
  layout — is real and tested.

Scale notes: payloads are large → small ``batch_size`` (16–64) so
batch × concurrency fits worker heaps; stages are actor pools so a real
codec context (the north star's "warm font/codec caches") is built once
per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional

import numpy as np
import pyarrow as pa

MEDIA_META_TYPE = pa.struct(
    [
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("n_frames", pa.int32()),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("meta", MEDIA_META_TYPE),
    ]
)

_MAGIC = b"FAKE"


# ---------------------------------------------------------------------------
# Deterministic synthetic payloads (the stub codec's wire format)
# ---------------------------------------------------------------------------


def _seed_bytes(key: str, n: int) -> np.ndarray:
    """n pseudo-random bytes derived from key (stable across runs/platforms)."""
    h = hashlib.sha256(key.encode()).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64)[0])
    return rng.integers(0, 256, size=n, dtype=np.uint8)


def fake_image(media_id: str, width: int = 64, height: int = 48, channels: int = 3) -> bytes:
    header = _MAGIC + b"IMG" + struct.pack("<iii", width, height, channels)
    return header + _seed_bytes(f"img:{media_id}", width * height * channels).tobytes()


def fake_audio(media_id: str, sample_rate: int = 16000, n_samples: int = 16000) -> bytes:
    header = _MAGIC + b"AUD" + struct.pack("<iq", sample_rate, n_samples)
    return header + (_seed_bytes(f"aud:{media_id}", n_samples * 2)).tobytes()


def synth_wav(media_id: str, sample_rate: int = 16000, n_samples: int = 16000) -> bytes:
    """A REAL RIFF/WAV payload (16-bit mono PCM) — deterministic tone +
    seeded noise.  This is genuine container-format bytes a stdlib codec
    decodes; the audio path is therefore NOT a stub (see _decode_wav)."""
    import io
    import wave as wave_mod

    h = hashlib.sha256(f"wav:{media_id}".encode()).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64)[0])
    freq = 110.0 + float(rng.integers(0, 880))
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    pcm = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n_samples)
    samples = np.clip(pcm * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes):
    """REAL audio decode via the stdlib ``wave`` codec (RIFF/WAV, PCM16).
    Returns (sample_rate, int16 numpy samples of the first channel)."""
    import io
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        sw = w.getsampwidth()
        if sw != 2:
            raise NotImplementedError(f"only 16-bit PCM supported, got {8 * sw}-bit")
        frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    if nch > 1:
        frames = frames[::nch]  # first channel
    return sr, frames


def fake_video(media_id: str, width: int = 32, height: int = 24, n_frames: int = 30) -> bytes:
    header = _MAGIC + b"VID" + struct.pack("<iii", width, height, n_frames)
    return header + _seed_bytes(f"vid:{media_id}", width * height * n_frames).tobytes()


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table for tests/bench: cycles image/audio/video."""
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        mid = f"m_{seed}_{i:06d}"
        kind = ("image", "audio", "video")[i % 3]
        ids.append(mid)
        kinds.append(kind)
        if kind == "image":
            w, h = 32 + (i % 4) * 16, 24 + (i % 3) * 16
            payloads.append(fake_image(mid, w, h))
            metas.append({"format": "fake-img", "width": w, "height": h, "channels": 3,
                          "sample_rate": 0, "n_samples": 0, "n_frames": 1})
        elif kind == "audio":
            # real RIFF/WAV bytes — the audio stage exercises an actual
            # container decode (stdlib wave codec), not the stub format
            ns = 8000 + (i % 5) * 4000
            payloads.append(synth_wav(mid, 16000, ns))
            metas.append({"format": "wav", "width": 0, "height": 0, "channels": 1,
                          "sample_rate": 16000, "n_samples": ns, "n_frames": 0})
        else:
            nf = 10 + (i % 4) * 10
            payloads.append(fake_video(mid, 32, 24, nf))
            metas.append({"format": "fake-vid", "width": 32, "height": 24, "channels": 1,
                          "sample_rate": 0, "n_samples": 0, "n_frames": nf})
    return pa.Table.from_arrays(
        [
            pa.array(ids, type=pa.string()),
            pa.array(kinds, type=pa.string()),
            pa.array(payloads, type=pa.binary()),
            pa.array(metas, type=MEDIA_META_TYPE),
        ],
        schema=MEDIA_SCHEMA,
    )


def _decode_fake(payload: bytes):
    """Stub decoder. A real build would call PIL/soundfile/ffmpeg here."""
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decode requires PIL/soundfile/ffmpeg (not in this "
            "container); only the deterministic fake payload format is supported"
        )
    tag = payload[4:7]
    if tag == b"IMG":
        w, h, c = struct.unpack("<iii", payload[7:19])
        arr = np.frombuffer(payload[19 : 19 + w * h * c], dtype=np.uint8)
        return arr.reshape(h, w, c)
    if tag == b"AUD":
        sr, ns = struct.unpack("<iq", payload[7:19])
        wave = np.frombuffer(payload[19 : 19 + ns * 2], dtype=np.int16)
        return sr, wave
    if tag == b"VID":
        w, h, nf = struct.unpack("<iii", payload[7:19])
        arr = np.frombuffer(payload[19 : 19 + w * h * nf], dtype=np.uint8)
        return arr.reshape(nf, h, w)
    raise ValueError(f"unknown fake payload tag {tag!r}")


# ---------------------------------------------------------------------------
# Actor-pool stages
# ---------------------------------------------------------------------------


class ImageFeatures:
    """image payloads → (media_id, width, height, channels, mean_px, std_px,
    phash64).  Use small batch_size (≤64): payload bytes dominate memory."""

    def __init__(self, fake: bool = True):
        # Real build: codec/font caches warm up here, once per actor.
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, cs, means, stds, phashes = [], [], [], [], [], [], []
        kinds = batch.column("kind").to_pylist()
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(), kinds, batch.column("payload").to_pylist()
        ):
            if kind != "image":
                continue
            if not self.fake:
                raise NotImplementedError("real image decode unavailable (see module docstring)")
            img = _decode_fake(payload)
            h, w, c = img.shape
            # 8x8 average-hash (public aHash scheme), vectorized
            ys = np.linspace(0, h, 9, dtype=int)
            xs = np.linspace(0, w, 9, dtype=int)
            g = img.mean(axis=2)
            cells = np.array(
                [[g[ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                  for j in range(8)] for i in range(8)]
            )
            bits = (cells > cells.mean()).flatten()
            phash = int(np.packbits(bits).view(">u8")[0])
            ids.append(mid); ws.append(w); hs.append(h); cs.append(c)
            means.append(float(img.mean())); stds.append(float(img.std()))
            phashes.append(phash - (1 << 63))  # store as signed int64
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.string()),
                pa.array(ws, type=pa.int32()),
                pa.array(hs, type=pa.int32()),
                pa.array(cs, type=pa.int32()),
                pa.array(means, type=pa.float64()),
                pa.array(stds, type=pa.float64()),
                pa.array(phashes, type=pa.int64()),
            ],
            names=["media_id", "width", "height", "channels", "mean_px", "std_px", "phash64"],
        )


class ImageResizer:
    """image payloads → resized payloads (nearest-neighbor, numpy take)."""

    def __init__(self, target_w: int = 32, target_h: int = 32, fake: bool = True):
        self.tw, self.th, self.fake = target_w, target_h, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "image":
                continue
            if not self.fake:
                raise NotImplementedError("real image decode unavailable (see module docstring)")
            img = _decode_fake(payload)
            h, w, c = img.shape
            yi = (np.arange(self.th) * h // self.th)
            xi = (np.arange(self.tw) * w // self.tw)
            resized = img[yi][:, xi]
            header = _MAGIC + b"IMG" + struct.pack("<iii", self.tw, self.th, c)
            ids.append(mid)
            payloads.append(header + resized.tobytes())
        return pa.Table.from_arrays(
            [pa.array(ids, type=pa.string()), pa.array(payloads, type=pa.binary())],
            names=["media_id", "payload"],
        )


class AudioFeatures:
    """audio payloads → per-clip RMS/zero-crossing features over fixed windows.

    RIFF/WAV payloads take the REAL stdlib-``wave`` decode path; the FAKE
    wire format remains accepted for the synthetic stub payloads
    (``fake=False`` rejects it, the honest-stub switch)."""

    def __init__(self, window: int = 2048, fake: bool = True):
        self.window, self.fake = window, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, srs, secs, rms, zcr = [], [], [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "audio":
                continue
            if payload[:4] == b"RIFF":
                sr, wave = _decode_wav(payload)
            elif not self.fake:
                raise NotImplementedError("real audio decode unavailable (see module docstring)")
            else:
                sr, wave = _decode_fake(payload)
            x = wave.astype(np.float64) / 32768.0
            n = (len(x) // self.window) * self.window
            frames = x[:n].reshape(-1, self.window)
            ids.append(mid)
            srs.append(sr)
            secs.append(len(x) / sr)
            rms.append(float(np.sqrt((frames ** 2).mean(axis=1)).mean()) if n else 0.0)
            zcr.append(float((np.diff(np.signbit(x)) != 0).mean()))
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.string()),
                pa.array(srs, type=pa.int32()),
                pa.array(secs, type=pa.float64()),
                pa.array(rms, type=pa.float64()),
                pa.array(zcr, type=pa.float64()),
            ],
            names=["media_id", "sample_rate", "duration_sec", "mean_rms", "zcr"],
        )


class VideoFrameSampler:
    """video payloads → one output row per sampled frame (every ``stride``-th),
    frame re-encoded as a fake-IMG payload — flat_map-shaped fan-out."""

    def __init__(self, stride: int = 10, fake: bool = True):
        self.stride, self.fake = stride, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, payloads = [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            if not self.fake:
                raise NotImplementedError("real video decode unavailable (see module docstring)")
            frames = _decode_fake(payload)
            nf, h, w = frames.shape
            for fi in range(0, nf, self.stride):
                frame = np.repeat(frames[fi][:, :, None], 3, axis=2)
                header = _MAGIC + b"IMG" + struct.pack("<iii", w, h, 3)
                ids.append(mid)
                idxs.append(fi)
                payloads.append(header + frame.tobytes())
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.string()),
                pa.array(idxs, type=pa.int32()),
                pa.array(payloads, type=pa.binary()),
            ],
            names=["media_id", "frame_idx", "payload"],
        )
