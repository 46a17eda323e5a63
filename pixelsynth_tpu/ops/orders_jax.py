"""On-device generation orders and kernel masks (pure JAX, batched).

The reference computes the greedy generation order with a host-side Cython
heap (get_custom_order.pyx:50-82) and builds kernel masks with Python loops
(masking.py:287-341), forcing a device->host->device round trip per view
(z_buffermodel.py:662-699).  On TPU we keep everything on device:

  * the greedy "pop the max-distance frontier pixel" loop is a
    `lax.fori_loop` of HW masked-argmax steps over the flat grid -- exact
    heap semantics (max distance, ties broken by ascending (r, c)) because
    all priorities are static: the heap's content is exactly the
    pushed-not-yet-popped frontier set, so a masked argmax with the fused
    key  distance*10000*2048 - flat_index  reproduces heapq's
    (-distance, [r, c]) ordering bit-for-bit;
  * kernel masks are rank-grid shift comparisons (9 taps x 3 variants).

Everything vmaps over the batch, shards over the mesh data axis, and
differentiation never touches it (integer outputs).  Validated against the
C++/Python host implementation in tests/test_orders_jax.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG_RANK = jnp.int32(1 << 30)


def custom_order_jax(distances: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) int32 signed distances -> (B, H*W) flat generation order."""
    B, H, W = distances.shape
    HW = H * W

    # The reference scales distances by 10000 (get_custom_order.pyx line 26),
    # so distinct distances differ by >= 10000 and a flat-index term < 10000
    # implements the lexicographic (r, c) tie break losslessly.
    assert HW < 10000, "grid too large for the fused tie-break key"

    def one(dist):
        d = dist.reshape(-1).astype(jnp.int32) * 10000
        idx = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0).reshape(-1)
        # maximize distance, break ties by ascending flat index
        score = d - idx
        start = jnp.argmax(score).astype(jnp.int32)

        r = idx // W
        c = idx % W
        # neighbor flat ids (clamped; validity handled separately)
        nb = jnp.stack([idx - W, idx + W, idx - 1, idx + 1], 1)
        nb_ok = jnp.stack([r > 0, r < H - 1, c > 0, c < W - 1], 1)
        nb = jnp.clip(nb, 0, HW - 1)

        used0 = jnp.zeros((HW,), bool).at[start].set(True)
        frontier0 = jnp.zeros((HW,), bool)
        order0 = jnp.zeros((HW,), jnp.int32).at[0].set(start)

        def body(t, state):
            used, frontier, order, cur = state
            # push unvisited 4-neighbors of the last popped pixel
            cand = nb[cur]
            ok = nb_ok[cur] & ~used[cand]
            used = used.at[cand].max(ok)
            frontier = frontier.at[cand].max(ok)
            # pop: max score over the frontier
            msk = jnp.where(frontier, score, -_BIG_RANK)
            p = jnp.argmax(msk).astype(jnp.int32)
            frontier = frontier.at[p].set(False)
            order = order.at[t].set(p)
            return used, frontier, order, p

        _, _, order, _ = jax.lax.fori_loop(
            1, HW, body, (used0, frontier0, order0, start)
        )
        return order

    return jax.vmap(one)(distances)


def rank_from_flat_order(order_flat: jnp.ndarray, HW: int) -> jnp.ndarray:
    """(B, HW) flat order -> (B, HW) rank per pixel."""
    B = order_flat.shape[0]
    ranks = jnp.zeros((B, HW), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(HW, dtype=jnp.int32)[None], (B, HW))
    return ranks.at[jnp.arange(B)[:, None], order_flat].set(pos)


def order_flat_to_coords(order_flat: jnp.ndarray, W: int) -> jnp.ndarray:
    """(B, HW) -> (B, HW, 2) [row, col]."""
    return jnp.stack([order_flat // W, order_flat % W], axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "max_dilation", "H", "W"))
def masks_from_rank(
    rank: jnp.ndarray, *, H: int, W: int, k: int = 3, max_dilation: int = 2
) -> jnp.ndarray:
    """Rank grid (B, H*W) -> mask triple (B, 3, k*k, H*W): [A dil 1,
    B dil 1, B dil max_dilation] (masking.get_masks, masking.py:351-370).

    Tap (dr, dc) of pixel p is enabled iff rank[p + (dr,dc)*dil] < rank[p];
    out-of-bounds taps are 0; B-type re-enables the center tap.
    """
    B = rank.shape[0]
    half = k // 2
    rg = rank.reshape(B, H, W)

    def taps(dilation):
        pad = half * dilation
        padded = jnp.pad(rg, ((0, 0), (pad, pad), (pad, pad)),
                         constant_values=_BIG_RANK)
        tap_list = []
        for dr in range(-half, half + 1):
            for dc in range(-half, half + 1):
                nbr = jax.lax.dynamic_slice(
                    padded,
                    (0, pad + dr * dilation, pad + dc * dilation),
                    (B, H, W),
                )
                allowed = (nbr < rg) & (nbr != _BIG_RANK)
                tap_list.append(allowed.reshape(B, H * W))
        return jnp.stack(tap_list, axis=1).astype(jnp.float32)  # (B, k*k, HW)

    center = (k * k) // 2
    t1 = taps(1)
    mask_a = t1.at[:, center].set(0.0)
    mask_b = t1.at[:, center].set(1.0)
    td = taps(max_dilation) if max_dilation != 1 else t1
    mask_d = td.at[:, center].set(1.0)
    return jnp.stack([mask_a, mask_b, mask_d], axis=1)


def orders_and_masks_jax(
    distances: jnp.ndarray, k: int = 3, max_dilation: int = 2
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W) distances -> (order (B, HW, 2), masks (B, 3, k*k, HW)).

    Drop-in on-device replacement for the host path
    (pipeline.orders_and_masks)."""
    B, H, W = distances.shape
    flat = custom_order_jax(distances)
    rank = rank_from_flat_order(flat, H * W)
    masks = masks_from_rank(rank, H=H, W=W, k=k, max_dilation=max_dilation)
    return order_flat_to_coords(flat, W), masks
