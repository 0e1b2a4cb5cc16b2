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


_banded_cache: dict[tuple[int, int, int], tuple[np.ndarray, np.ndarray]] = {}


def _banded_weights(src_n: int, dst_n: int, a: int = _A) -> tuple[np.ndarray, np.ndarray]:
    """Banded form of the axis weights: (dst_n, taps) kernel + (dst_n,)
    first source index, derived from the SAME dense table as _weights so
    both paths share one numeric definition.

    The dense (dst, src) matrix is ~95% zeros (support 6-12 of src);
    applying it as a GEMM burns src/taps x the necessary FLOPs — measured
    as the whole pyramid running 15x slower, flat across cores."""
    key = (src_n, dst_n, a)
    if key not in _banded_cache:
        dense = _weights(src_n, dst_n, a)
        scale = src_n / dst_n
        support = a * max(scale, 1.0)
        taps = int(np.ceil(2 * support)) + 2
        lo = np.clip(
            np.floor((np.arange(dst_n) + 0.5) * scale - 0.5 - support).astype(np.int64),
            0, max(src_n - taps, 0),
        )
        band = np.zeros((dst_n, taps), dtype=np.float64)
        for j in range(dst_n):
            seg = dense[j, lo[j]:lo[j] + taps]
            band[j, :len(seg)] = seg
        _banded_cache[key] = (band, lo)
    return _banded_cache[key]


def _apply_axis0(arr: np.ndarray, band: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(src, W, C) -> (dst, W, C): banded weighted sum along axis 0,
    one strided gather-axpy per tap (taps ~ 8-14, not src)."""
    dst_n, taps = band.shape
    out = np.zeros((dst_n,) + arr.shape[1:], dtype=arr.dtype)
    for k in range(taps):
        idx = np.minimum(lo + k, arr.shape[0] - 1)
        out += band[:, k].reshape((-1,) + (1,) * (arr.ndim - 1)) * arr[idx]
    return out


_DOWN2_TAPS = 12
_down2_kernel_cache: dict[int, np.ndarray] = {}


def _down2_kernel(a: int = _A) -> np.ndarray:
    """The single 12-tap kernel of the 2:1 resize: every output center sits
    at src 2j+0.5, so the fractional phase is CONSTANT and one kernel
    serves all rows — (idx - center)/2 for idx in [2j-5, 2j+6]."""
    if a not in _down2_kernel_cache:
        x = (np.arange(_DOWN2_TAPS) - 5.5) / 2.0
        k = lanczos_kernel(x, a)
        _down2_kernel_cache[a] = k / k.sum()
    return _down2_kernel_cache[a]


def _down2_axis0(arr: np.ndarray) -> np.ndarray:
    """(2n, W, C) -> (n, W, C) along axis 0: edge-replicate pad (identical
    to the dense table's clip-accumulate) + strided 12-tap reduction."""
    kern = _down2_kernel().astype(arr.dtype, copy=False)  # avoid upcast in einsum
    n = arr.shape[0] // 2
    pad = np.concatenate([arr[:1]] * 5 + [arr] + [arr[-1:]] * 6, axis=0)
    s = pad.strides
    view = np.lib.stride_tricks.as_strided(
        pad, shape=(n, _DOWN2_TAPS) + pad.shape[1:], strides=(2 * s[0], s[0]) + s[1:]
    )
    # optimize=False: a 2-operand contraction has exactly one path, and the
    # per-call path search doubles the call cost (measured 85us -> 41us)
    return np.einsum("t,jt...->j...", kern, view, optimize=False)


def resize_lanczos(img: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """Lanczos-3 resize of (H, W) or (H, W, C) u8/float array -> u8.

    Separable banded convolution: rows then columns, O(HW * taps).  The
    exact 2:1 case (the pyramid hot path) uses a single constant-phase
    12-tap kernel over a strided view — no dense weight matrix, no per-tap
    temporaries."""
    squeeze = np.asarray(img).ndim == 2
    if h_fast := (np.asarray(img).shape[0] == 2 * dst_h and np.asarray(img).shape[1] == 2 * dst_w):
        # float32 on the 2:1 hot path: verified bit-identical u8 output on
        # golden + randomized tiles, half the memory traffic
        arr = np.asarray(img, dtype=np.float32)
    else:
        arr = np.asarray(img, dtype=np.float64)
    if squeeze:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if h_fast:
        tmp = _down2_axis0(arr)
        out = _down2_axis0(tmp.transpose(1, 0, 2)).transpose(1, 0, 2)
    else:
        by, loy = _banded_weights(h, dst_h)
        bx, lox = _banded_weights(w, dst_w)
        tmp = _apply_axis0(arr, by, loy)                   # (dst_h, w, c)
        out = _apply_axis0(tmp.transpose(1, 0, 2), bx, lox).transpose(1, 0, 2)
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
