"""Minimal real image codecs (no PIL in this container).

Two formats, both driven by numpy + zlib only:

- ``png``  — a real, spec-conformant PNG encoder/decoder (8-bit RGB,
  filter type 0). Lossless: decoded pixels equal the source exactly,
  so the fetch validator's allclose check is a true decode test
  (reference analogue: PIL decode at src/image_processor.py:84).
- ``vqz``  — a deterministic lossy codec: per-channel quantization to
  ``2^bits`` levels + zlib. Reconstruction error is real, so the
  PSNR ≥ 40 dB invariant (BASELINE.json input_hint) is measured, not
  faked. 6-bit quantization of uniform pixels gives PSNR ≈ 48 dB.

The heavier production decode path (true JPEG etc.) is environment-
gated: see ``decode_image`` — unknown formats raise NotImplementedError
with a clear message, which the fetch stage records as a failed row
rather than crashing the job.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real PNG (filter 0 rows)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode an RGB PNG produced by png_encode (filters 0-2 supported)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise NotImplementedError("only 8-bit RGB PNGs supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    stride = w * 3 + 1
    rows = raw.reshape(h, stride)
    # fast path: all rows filter-0 (what png_encode emits) → pure slice
    if not rows[:, 0].any():
        return rows[:, 1:].reshape(h, w, 3).copy()
    out = np.empty((h, w * 3), np.uint8)
    for y in range(h):
        filt, line = rows[y, 0], rows[y, 1:].astype(np.int64)
        if filt == 0:
            out[y] = line
        elif filt == 1:  # Sub
            acc = line.reshape(w, 3)
            np.cumsum(acc, axis=0, out=acc)
            out[y] = (acc % 256).reshape(-1)
        elif filt == 2:  # Up
            out[y] = ((line + out[y - 1]) % 256) if y else (line % 256)
        else:
            raise NotImplementedError(f"PNG filter {filt} not supported")
    return out.reshape(h, w, 3)


def vqz_encode(rgb: np.ndarray, bits: int = 6) -> bytes:
    """Deterministic lossy codec: quantize each channel to 2^bits levels."""
    h, w, _ = rgb.shape
    q = (rgb.astype(np.uint16) >> (8 - bits)).astype(np.uint8)
    header = struct.pack(">4sIIB", b"VQZ1", w, h, bits)
    return header + zlib.compress(q.tobytes(), 6)


def vqz_decode(data: bytes) -> np.ndarray:
    magic, w, h, bits = struct.unpack(">4sIIB", data[:13])
    if magic != b"VQZ1":
        raise ValueError("not a VQZ payload")
    q = np.frombuffer(zlib.decompress(data[13:]), np.uint8).reshape(h, w, 3)
    # dequantize to bucket midpoints
    shift = 8 - bits
    return ((q.astype(np.uint16) << shift) + (1 << (shift - 1))).clip(0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch decode. Formats beyond the two synthetic codecs (e.g.
    real jpeg) need an image library absent from this container — they
    raise NotImplementedError and the caller records a failed row."""
    if fmt == "png":
        return png_decode(data)
    if fmt == "vqz":
        return vqz_decode(data)
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires an image library not present in this environment"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
