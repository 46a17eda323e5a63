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

    # fused-backend fast path: logits at the ONE consumed position per
    # image (ops/lmconv_fused.make_fused_logits_fn.at) -- skips the
    # full-grid nin einsum and its (B, HW, C) HBM materialization that
    # the generic path computes only to gather one row
    logits_at = getattr(logits_fn, "at", None)

    def body(t, state):
        cur, filled = state
        pos = positions[:, t]                                   # (B,)
        active = (t < n_bg)                                     # (B,)
        if logits_at is not None:
            sel_logits = logits_at(
                cur.reshape(B, H, W), filled.reshape(B, H, W), pos
            )                                                   # (B, C)
        else:
            logits = logits_fn(cur.reshape(B, H, W), filled.reshape(B, H, W))
            logits = logits.reshape(B, HW, num_classes)
            sel_logits = jnp.take_along_axis(
                logits, pos[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]                                             # (B, C)
        k = jax.random.fold_in(key, t)
        new = jax.random.categorical(k, sel_logits / temperature, axis=-1)
        sel = jax.nn.one_hot(pos, HW, dtype=filled.dtype) * active[:, None]
        cur = jnp.where((sel > 0), new[:, None].astype(jnp.int32), cur)
        filled = jnp.maximum(filled, sel)
        return cur, filled

    cur, _ = jax.lax.fori_loop(0, steps, body, (codes0, filled0))
    return cur.reshape(B, H, W)


def ar_sample_speculative(
    logits_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    codes: jnp.ndarray,
    order: jnp.ndarray,
    bg_ds: jnp.ndarray,
    key: jax.Array,
    *,
    num_classes: int = 512,
    temperature: float = 1.0,
    spec: int = 3,
    return_stats: bool = False,
) -> jnp.ndarray:
    """`ar_sample` with EXACT speculative multi-cell decoding.

    The locally-masked convs enforce the AR factorization at every layer:
    in a forward over a grid where cells t..t+S-1 hold *speculated* values,
    the logits at order-position t+j still depend only on cells earlier in
    the generation order -- i.e. they are the TRUE conditional given the
    committed prefix plus speculated cells 0..j-1 (the property that makes
    teacher forcing work, locally_masked_convolution.py:25-50).  So one
    forward verifies a whole draft chain, exactly like LLM speculative
    decoding with the model as its own draft (the draft distribution for
    cell t+j is the previous forward's logits at that position, whose
    context was stale by up to S cells).

    Per forward: gather 2S+1 logit rows (needs logits_fn.at); run the
    standard accept chain -- accept draft d_j w.p. min(1, p_j(d_j)/q_j(d_j)),
    on first rejection resample from normalize(max(p-q, 0)), on full
    acceptance take a bonus sample -- then redraft the next S cells from
    this forward's later rows.  Commits 1..S+1 cells per forward while
    sampling from EXACTLY the same joint distribution as `ar_sample`
    (standard speculative-sampling correctness; q is a valid draft even
    when its context contained later-rejected values).

    Falls back to `ar_sample` when logits_fn has no `.at` fast path.
    """
    if getattr(logits_fn, "at", None) is None:
        return ar_sample(logits_fn, codes, order, bg_ds, key,
                         num_classes=num_classes, temperature=temperature)
    S = int(spec)
    G = 2 * S + 1
    B, H, W = codes.shape
    HW = H * W
    positions, n_bg = sample_positions(order, bg_ds)

    bg_sel = (
        jnp.zeros((B, HW))
        .at[jnp.arange(B)[:, None], positions]
        .add(jnp.where(jnp.arange(HW)[None] < n_bg[:, None], 1.0, 0.0))
    )
    filled0 = 1.0 - bg_sel
    codes0 = codes.reshape(B, HW).astype(jnp.int32)
    b_idx = jnp.arange(B)[:, None]
    jS = jnp.arange(S)[None]                                 # (1, S)
    eps = 1e-20

    def cond(state):
        _, _, t, _, _, it = state
        return jnp.any(t < n_bg)

    def body(state):
        cur_c, fil_c, t, dvals, qp, it = state
        k_it = jax.random.fold_in(key, it)
        k_acc, k_res, k_draft = jax.random.split(k_it, 3)

        # probe positions t..t+2S (order-frame), clamped
        idx = jnp.minimum(t[:, None] + jnp.arange(G)[None], HW - 1)
        probe = jnp.take_along_axis(positions, idx, axis=1)   # (B, G)

        # write current drafts into the grid (only real bg steps); cells
        # later in the order never reach earlier rows' receptive fields,
        # so garbage drafts cannot contaminate the rows we commit from
        draft_ok = (t[:, None] + jS) < n_bg[:, None]          # (B, S)
        pos_d = jnp.where(draft_ok, probe[:, :S], HW)          # OOB -> drop
        cur_s = cur_c.at[b_idx, pos_d].set(dvals, mode="drop")
        fil_s = fil_c.at[b_idx, pos_d].set(1.0, mode="drop")

        l = logits_fn.at(cur_s.reshape(B, H, W), fil_s.reshape(B, H, W),
                         probe)                                # (B, G, C)
        p = jax.nn.softmax(l[:, :S + 1] / temperature, -1)     # (B, S+1, C)

        # accept chain over the S drafts
        p_at_d = jnp.take_along_axis(p[:, :S], dvals[..., None], -1)[..., 0]
        q_at_d = jnp.take_along_axis(qp[:, :S], dvals[..., None], -1)[..., 0]
        ratio = jnp.minimum(p_at_d / jnp.maximum(q_at_d, eps), 1.0)
        u = jax.random.uniform(k_acc, (B, S))
        accept = (u < ratio) & (q_at_d > eps) & draft_ok
        lead = jnp.cumprod(accept.astype(jnp.int32), axis=1)
        A = jnp.sum(lead, axis=1)                              # (B,)

        # cell A: residual resample (bonus row uses q=0 -> residual = p)
        pA = jnp.take_along_axis(p, A[:, None, None], 1)[:, 0]  # (B, C)
        qA = jnp.take_along_axis(qp, A[:, None, None], 1)[:, 0]
        res = jnp.maximum(pA - qA, 0.0)
        rsum = jnp.sum(res, -1, keepdims=True)
        res = jnp.where(rsum > eps, res / jnp.maximum(rsum, eps), pA)
        r = jax.random.categorical(k_res, jnp.log(res + 1e-30), axis=-1)

        # commit min(A+1, n_bg - t) cells
        commit_n = jnp.clip(A + 1, 0, jnp.maximum(n_bg - t, 0))
        # A==S lands in the appended bonus slot below (OOB here -> drop)
        vals = dvals.at[b_idx[:, 0], A].set(r, mode="drop")
        vals = jnp.concatenate([vals, r[:, None]], 1)          # (B, S+1)
        take = jnp.arange(S + 1)[None] < commit_n[:, None]
        pos_c = jnp.where(take, probe[:, :S + 1], HW)
        cur_c = cur_c.at[b_idx, pos_c].set(vals, mode="drop")
        fil_c = fil_c.at[b_idx, pos_c].set(1.0, mode="drop")
        t = t + commit_n

        # redraft the next S cells from this forward's later rows
        off = jnp.minimum(A[:, None] + 1 + jS, G - 1)          # (B, S)
        ql = jnp.take_along_axis(l, off[..., None], 1)         # (B, S, C)
        qp_new = jax.nn.softmax(ql / temperature, -1)
        d_new = jax.random.categorical(k_draft, ql / temperature, axis=-1)
        qp_full = jnp.concatenate(
            [qp_new, jnp.zeros((B, 1, num_classes))], axis=1)
        return cur_c, fil_c, t, d_new.astype(jnp.int32), qp_full, it + 1

    state0 = (codes0, filled0, jnp.zeros((B,), jnp.int32),
              jnp.zeros((B, S), jnp.int32),
              jnp.zeros((B, S + 1, num_classes)), jnp.int32(0))
    cur, _, _, _, _, n_fwd = jax.lax.while_loop(cond, body, state0)
    out = cur.reshape(B, H, W)
    if return_stats:
        # cells committed / forwards run (population-max bg fill would
        # have cost max(n_bg) forwards sequentially)
        return out, {"n_forwards": n_fwd, "max_n_bg": jnp.max(n_bg)}
    return out


# ---------------------------------------------------------------------------
# candidate re-ranking (get_best_sample, z_buffermodel.py:244-276)
# ---------------------------------------------------------------------------


def rank_candidates_jax(
    discrim_scores: jnp.ndarray, entropy_scores: jnp.ndarray
) -> jnp.ndarray:
    """In-graph `rank_candidates`: (S,) scores -> scalar best index.

    Keeping the selection on device lets the scene walk dispatch view k+1
    before view k's arrays are read back (the reference syncs per candidate,
    z_buffermodel.py:246-263)."""
    S = discrim_scores.shape[0]
    ar = jnp.arange(S)
    discrim_ranks = jnp.zeros(S, jnp.int32).at[jnp.argsort(discrim_scores)].set(ar)
    entropy_ranks = jnp.zeros(S, jnp.int32).at[jnp.argsort(entropy_scores)].set(ar)
    total = 0.5 * (S - 1 - entropy_ranks) + 0.5 * discrim_ranks
    return jnp.argmax(total)


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


# canonical home is the classifier module; re-exported here because the
# ranking math (rank_candidates / rank_candidates_jax below) consumes it
from pixelsynth_tpu.models.classifier import classifier_entropy  # noqa: E402
