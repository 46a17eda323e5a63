"""On-device order/mask construction must match the host (C++/numpy)
implementation bit-for-bit."""

import jax
import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.ops.orders import custom_order, masks_for_orders_batch
from pixelsynth_tpu.ops.orders_jax import (
    custom_order_jax,
    masks_from_rank,
    order_flat_to_coords,
    orders_and_masks_jax,
    rank_from_flat_order,
)


def test_custom_order_jax_matches_host():
    rng = np.random.default_rng(0)
    for trial in range(4):
        dist = rng.integers(-20, 20, (2, 8, 8)).astype(np.int32)
        want = custom_order(dist)
        flat = np.asarray(custom_order_jax(jnp.asarray(dist)))
        got = np.asarray(order_flat_to_coords(jnp.asarray(flat), 8))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_custom_order_jax_realistic_32():
    # a realistic 32x32 signed-distance field (disk of foreground)
    ys, xs = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    fg = ((ys - 12) ** 2 + (xs - 18) ** 2 < 120).astype(np.int32)
    import scipy.ndimage as ndi

    fd = ndi.distance_transform_edt(fg)
    bd = ndi.distance_transform_edt(1 - fg)
    dist = np.trunc(fd - bd).astype(np.int32)[None]
    want = custom_order(dist)
    flat = np.asarray(custom_order_jax(jnp.asarray(dist)))
    got = np.asarray(order_flat_to_coords(jnp.asarray(flat), 32))
    np.testing.assert_array_equal(got, want)


def test_masks_from_rank_matches_host():
    rng = np.random.default_rng(1)
    dist = rng.integers(-10, 10, (2, 8, 8)).astype(np.int32)
    order = custom_order(dist)
    a, b, d = masks_for_orders_batch(list(order), 8, 8, 3, 2)
    want = np.stack([a, b, d], axis=1)

    order_j, masks_j = orders_and_masks_jax(jnp.asarray(dist), 3, 2)
    np.testing.assert_array_equal(np.asarray(order_j), order)
    np.testing.assert_array_equal(np.asarray(masks_j), want)


def test_rank_roundtrip():
    rng = np.random.default_rng(2)
    dist = rng.integers(-5, 5, (1, 8, 8)).astype(np.int32)
    flat = custom_order_jax(jnp.asarray(dist))
    rank = rank_from_flat_order(flat, 64)
    # rank of the t-th popped pixel is t
    f = np.asarray(flat)[0]
    r = np.asarray(rank)[0]
    for t in range(64):
        assert r[f[t]] == t


def test_orders_jax_jit_and_vmap():
    dist = jnp.asarray(np.random.default_rng(3).integers(-5, 5, (3, 8, 8)), jnp.int32)
    f = jax.jit(lambda d: orders_and_masks_jax(d))
    order, masks = f(dist)
    assert order.shape == (3, 64, 2)
    assert masks.shape == (3, 3, 9, 64)
