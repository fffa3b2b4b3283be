"""Real, dependency-free media codecs for the multimodal ops.

The container ships no PIL/cv2/soundfile, but the stdlib is enough for
two real formats — so the decode stage is genuinely implemented (not
stubbed) for:

- **PCM WAV** via the stdlib ``wave`` module (16-bit mono/stereo) —
  actual audio sample decode, enabling real RMS/peak features instead
  of byte-value proxies;
- **PNG, 8-bit grayscale, non-interlaced** via a minimal spec
  implementation (chunk walk → zlib inflate → per-scanline unfilter,
  all five filter types) — the common case for ML thumbnail/feature
  pipelines; JPEG and friends still route to the NotImplementedError
  stub (`ops.decode_image`) that a deployment swaps for PIL.

Encoders exist for both so tests synthesize payloads and assert exact
decode-encode roundtrips; the PNG unfilter path is additionally pinned
on hand-computed fixtures per filter type (tests/test_multimodal.py).

These run INSIDE mapInPandas batch loops (see ops.py) — plain Python
over numpy arrays per payload, Arrow-batched, partition-parallel.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# WAV (stdlib)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(
    samples: "np.ndarray | list[int]", sample_rate: int = 16_000
) -> bytes:
    """int16 samples → a complete PCM WAV payload. A 1-D array writes
    mono; a 2-D (n_frames, n_channels) array writes interleaved
    multi-channel (the WAV frame layout, row-major == interleaved)."""
    arr = np.asarray(samples, dtype=np.int16)
    n_channels = 1 if arr.ndim == 1 else int(arr.shape[1])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav_pcm16(payload: bytes) -> tuple[int, "np.ndarray"]:
    """PCM WAV payload → (sample_rate, int16 samples of shape
    (n_frames, n_channels) squeezed to 1-D for mono)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported, got sampwidth={w.getsampwidth()}"
            )
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        arr = np.frombuffer(raw, dtype=np.int16).reshape(n, w.getnchannels())
    # Squeeze ONLY the channel axis: a bare .squeeze() on a
    # single-frame mono file would also collapse the frame axis and
    # return a 0-d scalar, breaking the documented 1-D-for-mono shape.
    return rate, arr[:, 0] if arr.shape[1] == 1 else arr


# ---------------------------------------------------------------------------
# PNG: 8-bit grayscale, non-interlaced (minimal spec implementation)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray8(pixels: "np.ndarray") -> bytes:
    """2-D uint8 array → a complete non-interlaced grayscale PNG
    (filter type 0 per scanline)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError(f"expected a 2-D grid, got shape {arr.shape}")
    h, width = arr.shape
    ihdr = struct.pack(">IIBBBBB", width, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_gray8(payload: bytes) -> "np.ndarray":
    """Non-interlaced 8-bit grayscale PNG → 2-D uint8 array.

    Implements the real format: chunk walk with CRC verification, IDAT
    concatenation, zlib inflate, and all five scanline filters
    (None/Sub/Up/Average/Paeth). Anything else (color, palette, 16-bit,
    interlaced) raises — route those through a full decoder (PIL) in a
    deployment.
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "only 8-bit non-interlaced grayscale supported "
                    f"(depth={depth} color={color} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != height * stride:
        raise ValueError("IDAT length does not match dimensions")
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for r in range(height):
        ftype = raw[r * stride]
        line = np.frombuffer(
            raw[r * stride + 1 : (r + 1) * stride], dtype=np.uint8
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(1, width):
                cur[i] = (cur[i] + cur[i - 1]) % 256
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype == 3:  # Average
            cur = line.copy()
            cur[0] = (cur[0] + prev[0] // 2) % 256
            for i in range(1, width):
                cur[i] = (cur[i] + (cur[i - 1] + prev[i]) // 2) % 256
        elif ftype == 4:  # Paeth
            cur = line.copy()
            cur[0] = (cur[0] + _paeth(0, int(prev[0]), 0)) % 256
            for i in range(1, width):
                cur[i] = (
                    cur[i] + _paeth(int(cur[i - 1]), int(prev[i]), int(prev[i - 1]))
                ) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out
