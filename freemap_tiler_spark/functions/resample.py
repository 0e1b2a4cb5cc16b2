"""Resampling kernels: separable Lanczos-3 and bilinear, pure numpy.

These are the engine's equivalents of the reference's two resampling sites:

- GDAL warp with ``GRA_Lanczos`` during megatile reprojection
  (src/warp.rs:19, src/processor.rs:389), and
- ``image::imageops::resize(FilterType::Lanczos3)`` for the 2T->T parent
  downsample in the pyramid compose (src/processor.rs:287-308).

Implemented as a separable convolution: for each output coordinate the
contributing source window and Lanczos-3 weights are precomputed per-axis,
then applied as two matrix multiplications (vectorized over bands).  The 2:1
case uses a fixed precomputed weight table so parents are deterministic
across runs (golden-tested in tests/test_resample.py).

All kernels operate on float32/float64 internally and clip to u8 at the end,
matching the u8 pixel model of the reference (SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np

_A = 3  # Lanczos lobes


def lanczos_kernel(x: np.ndarray, a: int = _A) -> np.ndarray:
    """sinc(x) * sinc(x/a) windowed to |x| < a."""
    x = np.asarray(x, dtype=np.float64)
    out = np.sinc(x) * np.sinc(x / a)
    out[np.abs(x) >= a] = 0.0
    return out


def _axis_weights(src_n: int, dst_n: int, a: int = _A) -> np.ndarray:
    """Dense (dst_n, src_n) weight matrix for 1-D Lanczos resize.

    Uses pixel-center alignment: dst center j maps to src coordinate
    (j + 0.5) * src_n / dst_n - 0.5.  When downscaling, the kernel is
    stretched by the scale factor (standard anti-aliased resize).
    Weights are normalized per output pixel (edge clamp).
    """
    scale = src_n / dst_n
    support = a * max(scale, 1.0)
    w = np.zeros((dst_n, src_n), dtype=np.float64)
    for j in range(dst_n):
        center = (j + 0.5) * scale - 0.5
        lo = int(np.floor(center - support))
        hi = int(np.ceil(center + support))
        idx = np.arange(lo, hi + 1)
        x = (idx - center) / max(scale, 1.0)
        k = lanczos_kernel(x, a)
        idx_c = np.clip(idx, 0, src_n - 1)
        for i, wt in zip(idx_c, k):
            w[j, i] += wt
        s = w[j].sum()
        if s != 0:
            w[j] /= s
    return w


_weight_cache: dict[tuple[int, int, int], np.ndarray] = {}


def _weights(src_n: int, dst_n: int, a: int = _A) -> np.ndarray:
    key = (src_n, dst_n, a)
    if key not in _weight_cache:
        _weight_cache[key] = _axis_weights(src_n, dst_n, a)
    return _weight_cache[key]


def resize_lanczos(img: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """Lanczos-3 resize of (H, W) or (H, W, C) u8/float array -> u8.

    Separable: rows then columns (two GEMMs) — O(HW(H'+W')) but H', W' are
    tile-sized (<=512), and this runs inside Arrow-batched pandas UDFs only.
    """
    arr = np.asarray(img, dtype=np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    wy = _weights(h, dst_h)  # (dst_h, h)
    wx = _weights(w, dst_w)  # (dst_w, w)
    tmp = np.tensordot(wy, arr, axes=(1, 0))          # (dst_h, w, c) via BLAS
    out = np.tensordot(wx, tmp, axes=(1, 1)).transpose(1, 0, 2)  # (dst_h, dst_w, c)
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def downsample2x(img: np.ndarray) -> np.ndarray:
    """Fixed 2:1 Lanczos-3 downsample (2T x 2T -> T x T), the pyramid's A1
    resize step (src/processor.rs:287-308 semantics)."""
    h, w = img.shape[:2]
    return resize_lanczos(img, h // 2, w // 2)


def resize_bilinear(img: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """Bilinear resize (the reference's alternative GDAL mode), u8 out."""
    arr = np.asarray(img, dtype=np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    h, w, _ = arr.shape
    ys = (np.arange(dst_h) + 0.5) * h / dst_h - 0.5
    xs = (np.arange(dst_w) + 0.5) * w / dst_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = arr[y0][:, x0] * (1 - fx) + arr[y0][:, x1] * fx
    bot = arr[y1][:, x0] * (1 - fx) + arr[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def mosaic_children(children: dict[int, np.ndarray], tile_size: int, bands: int) -> np.ndarray:
    """Place <=4 child tiles on a 2T x 2T canvas at row-major offsets.

    Child index i lands at (x_off, y_off) = ((i & 1) * T, (i >> 1) * T) —
    the placement law of src/processor.rs:261-262.  Missing children stay
    zero (alpha 0), matching src/processor.rs:254-259.
    """
    t = tile_size
    canvas = np.zeros((2 * t, 2 * t, bands), dtype=np.uint8)
    for i, buf in children.items():
        ox, oy = (i & 1) * t, (i >> 1) * t
        canvas[oy:oy + t, ox:ox + t, :] = buf.reshape(t, t, bands)
    return canvas
