"""Generation orders and per-image kernel masks for the locally-masked
PixelCNN.

Replaces the reference's host machinery:
  * orders (raster / s-curve / custom greedy): models/lmconv/masking.py:21-119
    and the Cython get_custom_order.pyx (we use a C++ shared library, with an
    exact pure-Python fallback);
  * kernel masks: models/lmconv/masking.py:287-370 -- the reference builds
    them with a Python double loop over 1024 pixels x 9 taps; we reformulate
    as a *rank-grid comparison* that is fully vectorized (and also jittable):
    a kernel tap at offset (dr, dc) for pixel p is allowed iff
    rank[p + (dr,dc)] < rank[p] (mask type A) where rank is the pixel's
    position in the generation order; type B additionally enables the
    center tap.

Masks are produced in the compact (k*k, H*W) layout expected by
ops.masked_conv.locally_masked_conv2d; they are never repeated across
channel groups (the reference repeats them 513/160/80x on the host,
models/z_buffermodel.py:697-699).
"""

from __future__ import annotations

import ctypes
import heapq
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcustom_order.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "custom_order.cpp")
_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC_PATH):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.custom_order_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.custom_order_batch.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


# ---------------------------------------------------------------------------
# Orders
# ---------------------------------------------------------------------------


def raster_scan_order(rows: int, cols: int) -> np.ndarray:
    r, c = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    return np.stack([r.reshape(-1), c.reshape(-1)], -1)


def s_curve_order(rows: int, cols: int) -> np.ndarray:
    idx = []
    for r in range(rows):
        cs = range(cols) if r % 2 == 0 else range(cols - 1, -1, -1)
        idx.extend([r, c] for c in cs)
    return np.array(idx)


def _custom_order_py(rows: int, cols: int, distances: np.ndarray) -> np.ndarray:
    """Pure-Python fallback, exact mirror of get_custom_order.pyx:50-82."""
    d = distances.astype(np.int64) * 10000
    best = int(np.argmax(d))
    r, c = best // cols, best % cols
    used = np.zeros((rows, cols), bool)
    used[r, c] = True
    out = [[r, c]]
    heap: List[Tuple[int, int, int]] = []
    while len(out) < rows * cols:
        for nr, nc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
            if 0 <= nr < rows and 0 <= nc < cols and not used[nr, nc]:
                used[nr, nc] = True
                heapq.heappush(heap, (-int(d[nr, nc]), nr, nc))
        _, r, c = heapq.heappop(heap)
        out.append([r, c])
    return np.array(out, np.int32)


def custom_order(
    distances: np.ndarray, mass_center: Optional[np.ndarray] = None
) -> np.ndarray:
    """Greedy distance-descent generation order(s).

    distances: (rows, cols) or (B, rows, cols) signed-distance field (int).
    mass_center is accepted for API parity with the reference
    (masking.py:51-68) but -- exactly like the shipped Cython code -- it does
    not influence the order (the spiral tie-break is commented out upstream).
    Returns (rows*cols, 2) or (B, rows*cols, 2) int32.
    """
    del mass_center
    distances = np.asarray(distances)
    single = distances.ndim == 2
    batch = distances[None] if single else distances
    B, rows, cols = batch.shape
    lib = _load_native()
    if lib is not None:
        din = np.ascontiguousarray(batch.reshape(B, -1), np.int32)
        out = np.empty((B, rows * cols, 2), np.int32)
        lib.custom_order_batch(
            B, rows, cols,
            din.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    else:
        out = np.stack([_custom_order_py(rows, cols, b) for b in batch])
    return out[0] if single else out


def hilbert_order(rows: int, cols: int) -> np.ndarray:
    """Hilbert-curve order for power-of-two square grids (masking.py:38-48)."""
    assert rows == cols and rows > 0 and (rows & (rows - 1)) == 0
    # iterative d->(x,y) conversion of the Hilbert curve
    out = np.empty((rows * cols, 2), np.int64)
    for d in range(rows * cols):
        rx = ry = 0
        x = y = 0
        t = d
        s = 1
        while s < rows:
            rx = 1 & (t // 2)
            ry = 1 & (t ^ rx)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            x += s * rx
            y += s * ry
            t //= 4
            s *= 2
        out[d] = (y, x)  # reference stores (row=coords[1], col=coords[0])
    return out.astype(np.int32)


def generation_order(
    order: str,
    rows: int,
    cols: int,
    distances: Optional[np.ndarray] = None,
    mass_center: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Dispatch mirroring masking.get_generation_order_idx (masking.py:113-119)."""
    if order == "raster_scan":
        return raster_scan_order(rows, cols)
    if order == "s_curve":
        return s_curve_order(rows, cols)
    if order == "hilbert":
        return hilbert_order(rows, cols)
    if order == "s_curve_center_quarter_last":
        o = s_curve_order(rows, cols)
        center = {
            (r, c)
            for r in range(rows // 4, rows - rows // 4)
            for c in range(cols // 4, cols - cols // 4)
        }
        keep = [p for p in o.tolist() if tuple(p) not in center]
        last = [p for p in o.tolist() if tuple(p) in center]
        return np.array(keep + last, np.int32)
    if order == "custom":
        assert distances is not None
        return custom_order(distances, mass_center)
    raise ValueError(f"unknown order {order!r}")


def augment_orders(order: np.ndarray, rows: int, cols: int) -> List[np.ndarray]:
    """8 symmetry variants of an order (masking.py:133-143)."""
    o = np.asarray(order)
    refl_r = np.stack([rows - 1 - o[:, 0], o[:, 1]], -1)
    refl_c = np.stack([o[:, 0], cols - 1 - o[:, 1]], -1)
    refl_rc = np.stack([rows - 1 - o[:, 0], cols - 1 - o[:, 1]], -1)
    t = o[:, ::-1]
    return [
        o, refl_r, refl_c, refl_rc,
        t,
        np.stack([rows - 1 - t[:, 0], t[:, 1]], -1),
        np.stack([t[:, 0], cols - 1 - t[:, 1]], -1),
        np.stack([rows - 1 - t[:, 0], cols - 1 - t[:, 1]], -1),
    ]


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------


def rank_grid_from_order(order: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """(rows, cols) int32 grid of each pixel's position in the order."""
    order = np.asarray(order)
    rank = np.empty((rows, cols), np.int32)
    rank[order[:, 0], order[:, 1]] = np.arange(order.shape[0], dtype=np.int32)
    return rank


def kernel_masks_from_order(
    order: np.ndarray,
    rows: int,
    cols: int,
    k: int = 3,
    dilation: int = 1,
    mask_type: str = "B",
    observed: Optional[np.ndarray] = None,
) -> np.ndarray:
    """(rows*cols, k, k) {0,1} kernel masks in **row-major pixel order**.

    Vectorized equivalent of masking.kernel_masks (masking.py:287-341): tap
    (dr, dc) of pixel p is 1 iff the pixel at p+(dr,dc)*dilation was
    generated strictly before p (or is in `observed`), 0 if it overlaps
    padding; type B enables the center tap, type A forbids it.

    observed: optional (rows, cols) bool of pre-observed context pixels
    (inpainting; kernel_masks' observed_idx).
    """
    assert k % 2 == 1
    half = k // 2
    rank = rank_grid_from_order(order, rows, cols).astype(np.int64)
    # Observed pixels count as generated before everything (they enter
    # locs_generated up front in the reference, masking.py:310-313) -- but
    # only when *looked up as neighbors*; the center comparison keeps the
    # raw rank.
    nb_rank = np.where(observed, np.int64(-1), rank) if observed is not None else rank
    big = np.int64(1 << 60)
    padded = np.full(
        (rows + 2 * half * dilation, cols + 2 * half * dilation), big, np.int64
    )
    padded[half * dilation: half * dilation + rows,
           half * dilation: half * dilation + cols] = nb_rank

    masks = np.zeros((rows * cols, k, k), np.float32)
    center = rank.reshape(-1)
    for i, dr in enumerate(range(-half, half + 1)):
        for j, dc in enumerate(range(-half, half + 1)):
            nb = padded[
                half * dilation + dr * dilation: half * dilation + dr * dilation + rows,
                half * dilation + dc * dilation: half * dilation + dc * dilation + cols,
            ].reshape(-1)
            masks[:, i, j] = (nb < center) & (nb != big)
    if mask_type == "B":
        masks[:, half, half] = 1.0
    else:
        masks[:, half, half] = 0.0
    return masks


def masks_for_order(
    order: np.ndarray,
    rows: int,
    cols: int,
    k: int = 3,
    max_dilation: int = 2,
    observed: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mask_init A, mask_undilated B, mask_dilated B@max_dilation), each
    (k*k, rows*cols) float32 -- the compact unfolded layout of
    masking.get_unfolded_masks/get_masks (masking.py:343-370).
    """

    def unfold(m):
        return m.reshape(rows * cols, k * k).T.copy()

    a = unfold(kernel_masks_from_order(order, rows, cols, k, 1, "A", observed))
    b = unfold(kernel_masks_from_order(order, rows, cols, k, 1, "B", observed))
    if max_dilation == 1:
        d = b
    else:
        d = unfold(
            kernel_masks_from_order(order, rows, cols, k, max_dilation, "B", observed)
        )
    return a, b, d


def masks_for_orders_batch(
    orders: Sequence[np.ndarray], rows: int, cols: int, k: int = 3,
    max_dilation: int = 2,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stack masks_for_order over a batch -> three (B, k*k, rows*cols)."""
    triples = [masks_for_order(o, rows, cols, k, max_dilation) for o in orders]
    a, b, d = zip(*triples)
    return np.stack(a), np.stack(b), np.stack(d)
