"""Batched autoregressive outpainting.

Replaces the reference's sequential Python sampling loop
(models/lmconv/sample.py:8-73: <=1024 full PixelCNN forwards per sample per
view, one pixel at a time, num_samples x views times over) with ONE jitted
`lax.fori_loop` in which **the entire (views x samples) population advances
together**: every loop step runs a single batched PixelCNN forward on the
whole population and scatters one new code per population member.  The trip
count is the *maximum* background-pixel count over the population (dynamic,
no recompilation); members that finish early become no-ops via an active
mask.  This is the BASELINE.json "one sharded sampling loop" -- sharding
the population axis over the mesh data axis parallelizes it across chips.

Candidate re-ranking mirrors get_best_sample (models/z_buffermodel.py:
244-276): discriminator D_Fake hinge score + scene-classifier entropy,
rank-combined 50/50.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sample_positions(
    order: jnp.ndarray, bg_ds: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image flat positions to sample, ordered by the generation order
    and restricted to fully-background code cells (sample.py:24-47).

    order: (B, HW, 2) int; bg_ds: (B, H, W) float in [0,1] (avg-pooled
    background; a cell samples only when it is entirely background, the
    reference's `background_mask == 1` check).
    Returns (positions (B, HW) int32 [bg positions first, order-ranked],
             n_bg (B,) int32).
    """
    B, HW, _ = order.shape
    Wd = bg_ds.shape[-1]
    flat = order[:, :, 0] * Wd + order[:, :, 1]
    bgf = bg_ds.reshape(B, -1)
    in_bg = jnp.take_along_axis(bgf, flat, axis=1) >= 1.0 - 1e-6
    rank = jnp.broadcast_to(jnp.arange(HW, dtype=jnp.int32)[None], (B, HW))
    key = jnp.where(in_bg, rank, rank + HW)
    perm = jnp.argsort(key, axis=1)
    positions = jnp.take_along_axis(flat, perm, axis=1).astype(jnp.int32)
    n_bg = jnp.sum(in_bg, axis=1).astype(jnp.int32)
    return positions, n_bg


def ar_sample(
    logits_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    codes: jnp.ndarray,
    order: jnp.ndarray,
    bg_ds: jnp.ndarray,
    key: jax.Array,
    *,
    num_classes: int = 512,
    temperature: float = 1.0,
    max_steps: Optional[int] = None,
) -> jnp.ndarray:
    """Fill the background cells of `codes` autoregressively.

    The loop carries compact integer state -- (codes (B, H, W) int32,
    filled (B, H, W) float) -- instead of a one-hot tensor; the PixelCNN's
    first layer consumes it directly through the embedding-gather fast
    path (positions with filled=0 behave exactly like the reference's
    zeroed one-hot rows, sample.py:47).

    Args:
      logits_fn: (codes (B,H,W) int32, filled (B,H,W)) -> logits
        (B, H, W, num_classes) (the PixelCNN closed over its masks).
      codes: (B, H, W) int initial codes (visible content; background cells
        are overwritten).
      order: (B, H*W, 2) generation order; bg_ds: (B, H, W) float.
    Returns:
      (B, H, W) int32 sampled codes.
    """
    B, H, W = codes.shape
    HW = H * W
    positions, n_bg = sample_positions(order, bg_ds)
    steps = jnp.max(n_bg) if max_steps is None else jnp.int32(max_steps)

    # zero out the sampling region (sample.py:47): bg cells start unfilled
    bg_sel = (
        jnp.zeros((B, HW))
        .at[jnp.arange(B)[:, None], positions]
        .add(jnp.where(jnp.arange(HW)[None] < n_bg[:, None], 1.0, 0.0))
    )
    filled0 = 1.0 - bg_sel
    codes0 = codes.reshape(B, HW).astype(jnp.int32)

    def body(t, state):
        cur, filled = state
        logits = logits_fn(cur.reshape(B, H, W), filled.reshape(B, H, W))
        logits = logits.reshape(B, HW, num_classes)
        pos = positions[:, t]                                   # (B,)
        active = (t < n_bg)                                     # (B,)
        sel_logits = jnp.take_along_axis(
            logits, pos[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]                                                 # (B, C)
        k = jax.random.fold_in(key, t)
        new = jax.random.categorical(k, sel_logits / temperature, axis=-1)
        sel = jax.nn.one_hot(pos, HW, dtype=filled.dtype) * active[:, None]
        cur = jnp.where((sel > 0), new[:, None].astype(jnp.int32), cur)
        filled = jnp.maximum(filled, sel)
        return cur, filled

    cur, _ = jax.lax.fori_loop(0, steps, body, (codes0, filled0))
    return cur.reshape(B, H, W)


# ---------------------------------------------------------------------------
# candidate re-ranking (get_best_sample, z_buffermodel.py:244-276)
# ---------------------------------------------------------------------------


def rank_candidates(
    discrim_scores: np.ndarray, entropy_scores: np.ndarray
) -> int:
    """Rank-combine: 0.5*(S-1-entropy_rank) + 0.5*discrim_rank, argmax
    (z_buffermodel.py:264-276).  High D_Fake loss (discriminator fooled) and
    low classifier entropy (confident scene) win."""
    S = len(discrim_scores)
    sorted_disc = np.argsort(discrim_scores)
    sorted_entr = np.argsort(entropy_scores)
    discrim_ranks = np.empty(S, np.int64)
    entropy_ranks = np.empty(S, np.int64)
    discrim_ranks[sorted_disc] = np.arange(S)
    entropy_ranks[sorted_entr] = np.arange(S)
    total = 0.5 * (S - 1 - entropy_ranks) + 0.5 * discrim_ranks
    return int(np.argmax(total))


def d_fake_score(disc_apply, gen_img: jnp.ndarray, ref_img: jnp.ndarray) -> jnp.ndarray:
    """Per-candidate D_Fake hinge loss, the discriminator half of the
    ranking (run_discriminator_one_step's D_Fake, gan_loss.py:88-93).

    gen_img: (S, H, W, 3); ref_img: (1, H, W, 3) broadcastable.
    Returns (S,) scores (mean over scales/pixels per candidate).
    """
    S = gen_img.shape[0]
    ref = jnp.broadcast_to(ref_img, gen_img.shape)
    both = jnp.concatenate([gen_img, ref], axis=0)
    preds = disc_apply(both)
    per = []
    for scale in preds:
        final = scale[-1][:S]  # fake halves
        per.append(jnp.mean(jax.nn.relu(1.0 + final).reshape(S, -1), axis=1))
    return jnp.mean(jnp.stack(per), axis=0)


def classifier_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """Entropy of classifier softmax per candidate (z_buffermodel.py:259-261)."""
    p = jax.nn.softmax(logits, axis=-1)
    return -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-12)), axis=-1)
