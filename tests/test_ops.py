"""Tests for masked conv, distance transform, and generation orders/masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage

from pixelsynth_tpu.ops import (
    custom_order,
    generation_order,
    kernel_masks_from_order,
    locally_masked_conv2d,
    masks_for_order,
    rank_grid_from_order,
    signed_distance_field,
)
from pixelsynth_tpu.ops.distance_transform import (
    distance_to_zero,
    foreground_mass_center,
)
from pixelsynth_tpu.ops.orders import (
    _custom_order_py,
    _load_native,
    augment_orders,
    raster_scan_order,
    s_curve_order,
)


# ---------------------------------------------------------------------------
# locally masked conv
# ---------------------------------------------------------------------------


def naive_masked_conv(x, mask, weight, bias, dilation):
    """Loop reference: x (B,H,W,Cin), mask (B,k2,HW), weight (k2,Cin,Cout)."""
    B, H, W, Cin = x.shape
    K2, _, Cout = weight.shape
    k = int(round(K2 ** 0.5))
    half = k // 2
    out = np.zeros((B, H, W, Cout), np.float32)
    for b in range(B):
        for r in range(H):
            for c in range(W):
                acc = np.zeros(Cout, np.float32)
                for i, dr in enumerate(range(-half, half + 1)):
                    for j, dc in enumerate(range(-half, half + 1)):
                        p = i * k + j
                        rr, cc = r + dr * dilation, c + dc * dilation
                        if not (0 <= rr < H and 0 <= cc < W):
                            continue
                        m = mask[b, p, r * W + c]
                        if m == 0:
                            continue
                        acc += m * x[b, rr, cc] @ weight[p]
                out[b, r, c] = acc + bias
    return out


@pytest.mark.parametrize("dilation", [1, 2])
def test_masked_conv_matches_naive(dilation):
    rng = np.random.default_rng(0)
    B, H, W, Cin, Cout, k = 2, 6, 6, 3, 4, 3
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    mask = (rng.uniform(size=(B, k * k, H * W)) > 0.5).astype(np.float32)
    weight = rng.standard_normal((k * k, Cin, Cout)).astype(np.float32) * 0.1
    bias = rng.standard_normal(Cout).astype(np.float32)
    got = locally_masked_conv2d(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(weight),
        jnp.asarray(bias), dilation=dilation,
    )
    want = naive_masked_conv(x, mask, weight, bias, dilation)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_masked_conv_causality():
    """With raster-order masks, output at p must not depend on pixels after p."""
    rng = np.random.default_rng(1)
    H = W = 5
    order = raster_scan_order(H, W)
    a, b, d = masks_for_order(order, H, W, k=3, max_dilation=1)
    mask = jnp.asarray(a[None])  # type A: center not visible either
    weight = jnp.asarray(rng.standard_normal((9, 1, 1)).astype(np.float32))

    def f(x):
        return locally_masked_conv2d(x.reshape(1, H, W, 1), mask, weight)

    x = jnp.asarray(rng.standard_normal(H * W).astype(np.float32))
    J = jax.jacobian(lambda v: f(v).reshape(-1))(x)
    J = np.asarray(J)
    rank = rank_grid_from_order(order, H, W).reshape(-1)
    for p in range(H * W):
        for q in range(H * W):
            if rank[q] >= rank[p] and abs(J[p, q]) > 1e-8:
                raise AssertionError(f"output {p} depends on non-causal input {q}")


# ---------------------------------------------------------------------------
# distance transform
# ---------------------------------------------------------------------------


def test_distance_matches_scipy_edt():
    rng = np.random.default_rng(2)
    m = (rng.uniform(size=(3, 16, 16)) > 0.6).astype(np.float32)
    m[:, 0, 0] = 0  # ensure a zero exists
    got = np.asarray(distance_to_zero(jnp.asarray(m)))
    for b in range(3):
        want = scipy.ndimage.distance_transform_edt(m[b])
        np.testing.assert_allclose(got[b], want, atol=1e-4)


def test_signed_distance_field():
    fg = np.zeros((1, 8, 8), np.float32)
    fg[0, 2:6, 2:6] = 1
    sd = np.asarray(signed_distance_field(jnp.asarray(fg)))
    assert sd[0, 4, 4] > 0
    assert sd[0, 0, 0] < 0
    assert sd.dtype == np.int32


def test_mass_center_matches_reference_formula():
    fg = np.zeros((1, 4, 4), np.float32)
    fg[0, 1, 2] = 1
    mc = np.asarray(foreground_mass_center(jnp.asarray(fg)))
    # reference: mean over ALL pixels of coord*mask (z_buffermodel.py:659-663)
    assert mc[0, 0] == int(2 / 16)
    assert mc[0, 1] == int(1 / 16)


# ---------------------------------------------------------------------------
# orders
# ---------------------------------------------------------------------------


def _check_order_valid(order, rows, cols):
    assert order.shape == (rows * cols, 2)
    seen = set(map(tuple, order.tolist()))
    assert len(seen) == rows * cols
    # connectivity: each pixel (after the first) touches an earlier pixel
    placed = {tuple(order[0])}
    for r, c in order[1:]:
        assert any(
            (r + dr, c + dc) in placed for dr, dc in [(-1, 0), (1, 0), (0, -1), (0, 1)]
        )
        placed.add((r, c))


def test_custom_order_properties():
    rng = np.random.default_rng(3)
    rows = cols = 8
    dist = rng.integers(-10, 10, (rows, cols)).astype(np.int32)
    order = custom_order(dist)
    _check_order_valid(order, rows, cols)
    flat = np.argmax(dist)
    assert tuple(order[0]) == (flat // cols, flat % cols)


def test_native_matches_python():
    if _load_native() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(4)
    for _ in range(5):
        dist = rng.integers(-30, 30, (8, 8)).astype(np.int32)
        a = custom_order(dist.copy())
        b = _custom_order_py(8, 8, dist.copy())
        np.testing.assert_array_equal(a, b)


def test_custom_order_batch():
    rng = np.random.default_rng(5)
    dist = rng.integers(-10, 10, (3, 8, 8)).astype(np.int32)
    batch = custom_order(dist)
    assert batch.shape == (3, 64, 2)
    for b in range(3):
        np.testing.assert_array_equal(batch[b], custom_order(dist[b]))


def test_s_curve_and_raster():
    assert s_curve_order(4, 4).shape == (16, 2)
    assert tuple(s_curve_order(4, 4)[4]) == (1, 3)  # second row reversed
    assert tuple(raster_scan_order(4, 4)[5]) == (1, 1)


def test_augment_orders():
    order = raster_scan_order(4, 4)
    augs = augment_orders(order, 4, 4)
    assert len(augs) == 8
    for a in augs:
        assert len(set(map(tuple, a.tolist()))) == 16


# ---------------------------------------------------------------------------
# kernel masks
# ---------------------------------------------------------------------------


def naive_kernel_masks(order, rows, cols, k, dilation, mask_type):
    """Direct transcription of the reference algorithm (masking.py:287-341)."""
    half = k // 2
    masks = np.zeros((rows * cols, k, k), np.float32)
    generated = set()
    for (r, c) in order:
        rm = r * cols + c
        for dr in range(-half, half + 1):
            for dc in range(-half, half + 1):
                if dr == 0 and dc == 0:
                    continue
                loc = (r + dr * dilation, c + dc * dilation)
                if loc in generated:
                    masks[rm, half + dr, half + dc] = 1
        generated.add((r, c))
    if mask_type == "B":
        masks[:, half, half] = 1
    return masks


@pytest.mark.parametrize("dilation,mask_type", [(1, "A"), (1, "B"), (2, "B")])
def test_kernel_masks_match_reference_algorithm(dilation, mask_type):
    rng = np.random.default_rng(6)
    rows = cols = 8
    dist = rng.integers(-10, 10, (rows, cols)).astype(np.int32)
    order = custom_order(dist)
    got = kernel_masks_from_order(order, rows, cols, 3, dilation, mask_type)
    want = naive_kernel_masks(order, rows, cols, 3, dilation, mask_type)
    np.testing.assert_array_equal(got, want)


def test_masks_for_order_layout():
    order = raster_scan_order(4, 4)
    a, b, d = masks_for_order(order, 4, 4, k=3, max_dilation=2)
    assert a.shape == (9, 16) and b.shape == (9, 16) and d.shape == (9, 16)
    # type A: center tap (index 4) always 0; type B: always 1
    assert np.all(a[4] == 0)
    assert np.all(b[4] == 1)
    # first pixel of the order sees nothing (A) / itself only (B)
    first = order[0]
    p = first[0] * 4 + first[1]
    assert a[:, p].sum() == 0
    assert b[:, p].sum() == 1
