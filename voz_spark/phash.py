"""Perceptual image hashing (pHash) — the image-payload dedup axis.

The input-table contract (BASELINE.json input_hint) carries a
``phash:int64`` column next to the image bytes; the reference crawler
stores images raw and dedups only by URL (src/image_processor.py —
filename-keyed cache, no content hash). At 10^10 images a URL-seen set
misses re-hosted/re-encoded copies, so a training-data crawl needs
*content* dedup: a 64-bit DCT perceptual hash whose hamming distance
is small for visually-identical images (re-encoded, rescaled, lightly
noised) and ~32 for unrelated ones.

Algorithm (classic pHash, public domain design):
  luma → bilinear resize to 32×32 → 2-D DCT-II → top-left 8×8
  coefficient block → bit i = (coef_i > median of block) → 64 bits.

Everything is numpy on small fixed-size matrices — the Spark surface
(see dataprep.q60/q61) runs it inside Arrow-batched pandas UDFs, never
per-row Python at the DataFrame layer.
"""

from __future__ import annotations

import numpy as np

_N = 32  # resize target
_K = 8  # low-frequency block → 64 bits


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n×n)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_matrix(_N)


def _resize_bilinear(gray: np.ndarray, n: int = _N) -> np.ndarray:
    """Deterministic bilinear resample to n×n (works for both up- and
    down-scaling; sampling at cell centers, edges clamped)."""
    h, w = gray.shape
    ys = (np.arange(n) + 0.5) * h / n - 0.5
    xs = (np.arange(n) + 0.5) * w / n - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    tl = gray[np.ix_(y0, x0)]
    tr = gray[np.ix_(y0, x1)]
    bl = gray[np.ix_(y1, x0)]
    br = gray[np.ix_(y1, x1)]
    top = tl * (1 - fx) + tr * fx
    bot = bl * (1 - fx) + br * fx
    return top * (1 - fy) + bot * fy


def phash64(rgb: np.ndarray) -> int:
    """64-bit perceptual hash of an (h, w, 3) uint8 image, as a SIGNED
    int64 (matches the input-table contract phash:int64)."""
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_bilinear(gray)
    coeffs = (_DCT @ small @ _DCT.T)[:_K, :_K].ravel()
    bits = coeffs > np.median(coeffs)
    v = 0
    for b in bits:  # MSB-first: bit 63 = coefficient (0,0)
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))
