"""Pallas TPU kernel for the soft z-buffer splat blend.

The binning stage (ops/splat._bin_points_batched: ONE whole-batch
lax.sort_key_val over image|tile|depth-bucket keys + searchsorted segment
offsets + fixed-capacity gather) stays in XLA; this kernel replaces the
per-tile blend.  One program per image tile keeps the tile's full z-sorted
candidate list in VMEM and composites it in chunks of 128:

  * per-pixel/candidate squared distances, radius coverage, and the
    K-nearest-in-z cap (a running per-pixel count + within-chunk inclusive
    cumsum) on the VPU;
  * the alpha-compositing transmittance as an **exclusive cumsum of
    log(1-alpha) via a triangular-matrix matmul** -- no sequential scan,
    the MXU does the prefix;
  * feature accumulation as one (pixels x chunk) @ (chunk x C) matmul.

Exactly matches ops/splat._blend_tiles (tests/test_splat_pallas.py).
Training keeps the differentiable XLA path; `SplatConfig.use_pallas=True`
routes inference splats here (gradient flow is preserved by the custom-vjp
wrapper in ops/splat when needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelsynth_tpu.config import SplatConfig
from pixelsynth_tpu.ops.masked_conv_pallas import _use_interpret
from pixelsynth_tpu.ops.splat import _bin_dispatch, dilate_mask

CHUNK = 128


def _blend_kernel(pts_ref, feats_ref, valid_ref, origin_ref, tri_ref,
                  out_ref, cov_ref, *, TS, M, C, W, radius, pp_pixel, tau,
                  rad_pow, accumulation):
    P = TS * TS
    # build flat pixel coordinates directly in (P, 1) -- Mosaic rejects
    # the (TS, TS) -> (P, 1) shape cast
    idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    py = (idx // TS).astype(jnp.float32)
    px = (idx % TS).astype(jnp.float32)
    t = pl.program_id(0)
    rows = py + origin_ref[t, 0]
    cols = px + origin_ref[t, 1]

    s = 2.0 / W
    radius_ndc_pow = (radius * s) ** rad_pow

    n_chunks = M // CHUNK
    tri_excl = tri_ref[:]          # (CHUNK, CHUNK) strictly lower: j' < j

    out = jnp.zeros((P, C), jnp.float32)
    trans = jnp.ones((P, 1), jnp.float32)     # carried transmittance
    count = jnp.zeros((P, 1), jnp.float32)    # carried coverage count (K cap)
    covered = jnp.zeros((P, 1), jnp.float32)

    for c in range(n_chunks):
        pc = pts_ref[0, pl.ds(c * CHUNK, CHUNK), :]    # (CHUNK, 4)
        fc = feats_ref[0, pl.ds(c * CHUNK, CHUNK), :]  # (CHUNK, C)
        vc = valid_ref[0, pl.ds(c * CHUNK, CHUNK), :]  # (CHUNK, 1)
        dx = cols - pc[:, 0].reshape(1, CHUNK)
        dy = rows - pc[:, 1].reshape(1, CHUNK)
        dist2 = dx * dx + dy * dy                      # (P, CHUNK) px^2
        cover = jnp.where(
            (dist2 < radius * radius) & (vc.reshape(1, CHUNK) > 0), 1.0, 0.0
        )
        # K-nearest-in-z cap: candidates are z-sorted, rank = carried count
        # + within-chunk inclusive cumsum (triangular matmul)
        incl = jnp.dot(cover, tri_excl, preferred_element_type=jnp.float32) + cover
        keep = jnp.where(count + incl <= pp_pixel, cover, 0.0)
        d = jnp.clip(dist2 * (s * s) / radius_ndc_pow, 1e-3, 1.0)
        alpha = (1.0 - jnp.sqrt(d))
        if tau != 1.0:
            alpha = jnp.exp(tau * jnp.log(jnp.maximum(alpha, 1e-20)))
        alpha = alpha * keep

        if accumulation == "alphacomposite":
            la = jnp.log(jnp.maximum(1.0 - alpha, 1e-20))
            # exclusive prefix over the z-sorted chunk: la @ SL (j' < j)
            prefix = jnp.dot(la, tri_excl, preferred_element_type=jnp.float32)
            w = alpha * jnp.exp(prefix) * trans
            trans = trans * jnp.exp(
                jnp.sum(la, axis=1, keepdims=True)
            )
        else:  # wsum / wsumnorm accumulate raw alphas; norm at the end
            w = alpha
        out = out + jnp.dot(w, fc, preferred_element_type=jnp.float32)
        count = count + jnp.sum(cover, axis=1, keepdims=True)
        covered = jnp.maximum(covered, jnp.max(cover, axis=1, keepdims=True))
        if accumulation == "wsumnorm":
            # accumulate alpha mass in the unused trans carry
            trans = trans + jnp.sum(alpha, axis=1, keepdims=True)

    if accumulation == "wsumnorm":
        out = out / jnp.maximum(trans - 1.0, 1e-4)
    out_ref[0] = out.reshape(TS, TS, C)
    cov_ref[0] = covered.reshape(TS, TS)


@functools.partial(
    jax.jit,
    static_argnames=("W", "radius", "pp_pixel", "tau", "rad_pow",
                     "accumulation", "bg_ksize", "tile_size",
                     "max_points_per_tile", "binning", "sort_backend"),
)
def _splat_pallas_impl(points, feats, valid, *, W, radius, pp_pixel, tau,
                       rad_pow, accumulation, bg_ksize, tile_size,
                       max_points_per_tile, binning="argsort",
                       sort_backend="xla"):
    cfg = SplatConfig(
        radius=radius, pp_pixel=pp_pixel, tau=tau, rad_pow=rad_pow,
        accumulation=accumulation,
        background_smoothing_kernel_size=bg_ksize,
        tile_size=tile_size, max_points_per_tile=max_points_per_tile,
        binning=binning, sort_backend=sort_backend,
    )
    TS = tile_size
    nside = W // TS
    nT = nside * nside
    M = max_points_per_tile
    assert M % CHUNK == 0, "capacity must be a multiple of the chunk size"
    B, N, _ = points.shape
    C = feats.shape[-1]

    t_row = (jnp.arange(nT, dtype=jnp.float32) // nside) * TS
    t_col = (jnp.arange(nT, dtype=jnp.float32) % nside) * TS
    origins = jnp.stack([t_row, t_col], axis=-1)  # (nT, 2)
    # tri[j', j] = 1 iff j' < j (strictly upper triangular): the
    # prefix-sum operator for the exclusive cumsum matmul
    tri = jnp.asarray(np.triu(np.ones((CHUNK, CHUNK), np.float32), 1))

    kernel = functools.partial(
        _blend_kernel, TS=TS, M=M, C=C, W=W, radius=radius,
        pp_pixel=pp_pixel, tau=tau, rad_pow=rad_pow, accumulation=accumulation,
    )

    slot_idx_all, slot_valid_all = _bin_dispatch(points, valid, W, cfg)

    def per_image(pts, fts, slot_idx, slot_valid):
        spts = pts[slot_idx]                                  # (nT, M, 3)
        spts = jnp.concatenate(
            [spts, jnp.zeros_like(spts[..., :1])], axis=-1)   # pad to 4
        sfts = fts[slot_idx] * slot_valid[..., None]          # (nT, M, C)
        svld = slot_valid[..., None].astype(jnp.float32)      # (nT, M, 1)

        out, cov = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((nT, TS, TS, C), jnp.float32),
                jax.ShapeDtypeStruct((nT, TS, TS), jnp.float32),
            ),
            grid=(nT,),
            in_specs=[
                pl.BlockSpec((1, M, 4), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M, C), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M, 1), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # full origins table
                pl.BlockSpec((CHUNK, CHUNK), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, TS, TS, C), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TS, TS), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            interpret=_use_interpret(),
        )(spts.reshape(nT, M, 4)[:, :, :4],
          sfts, svld, origins, tri)

        img = out.reshape(nside, nside, TS, TS, C).transpose(0, 2, 1, 3, 4)
        img = img.reshape(W, W, C)
        covered = cov.reshape(nside, nside, TS, TS).transpose(0, 2, 1, 3)
        return img, covered.reshape(W, W) > 0

    out, covered = jax.vmap(per_image)(points, feats, slot_idx_all,
                                       slot_valid_all)
    background = dilate_mask(~covered, bg_ksize)
    return out, background


def splat_pallas(points, feats, valid, *, W, cfg: SplatConfig):
    """Drop-in for ops.splat.splat with cfg.use_pallas (same signature),
    differentiable: the forward runs the Pallas blend; the backward is the
    VJP of the equivalent XLA formulation (recomputed -- the same
    rematerialization trade the reference's hand-written conv backward
    makes, locally_masked_convolution.py:74-81), so gradients to point xy
    and features flow exactly as in ops.splat."""
    key = (W, cfg.radius, cfg.pp_pixel, cfg.tau, cfg.rad_pow,
           cfg.accumulation, cfg.background_smoothing_kernel_size,
           cfg.tile_size, cfg.max_points_per_tile, cfg.tile_group,
           cfg.binning, cfg.sort_backend)
    return _splat_pallas_diff(key)(points, feats, valid)


import functools as _functools


@_functools.lru_cache(maxsize=16)
def _splat_pallas_diff(key):
    (W, radius, pp_pixel, tau, rad_pow, accumulation, bg_ksize, tile_size,
     max_points_per_tile, tile_group, binning, sort_backend) = key
    cfg = SplatConfig(
        radius=radius, pp_pixel=pp_pixel, tau=tau, rad_pow=rad_pow,
        accumulation=accumulation, background_smoothing_kernel_size=bg_ksize,
        tile_size=tile_size, max_points_per_tile=max_points_per_tile,
        tile_group=tile_group, binning=binning, sort_backend=sort_backend,
    )

    @jax.custom_vjp
    def f(points, feats, valid):
        return _splat_pallas_impl(
            points, feats, valid, W=W, radius=radius, pp_pixel=pp_pixel,
            tau=tau, rad_pow=rad_pow, accumulation=accumulation,
            bg_ksize=bg_ksize, tile_size=tile_size,
            max_points_per_tile=max_points_per_tile, binning=binning,
            sort_backend=sort_backend,
        )

    def fwd(points, feats, valid):
        return f(points, feats, valid), (points, feats, valid)

    def bwd(res, g):
        from pixelsynth_tpu.ops.splat import _splat_impl

        points, feats, valid = res
        g_out, _ = g  # background mask is boolean (no cotangent)

        def xla_fwd(p, ft):
            out, _ = _splat_impl(
                p, ft, valid, W=W, radius=radius, pp_pixel=pp_pixel, tau=tau,
                rad_pow=rad_pow, accumulation=accumulation, bg_ksize=bg_ksize,
                tile_size=tile_size, max_points_per_tile=max_points_per_tile,
                tile_group=tile_group, binning=binning,
                sort_backend=sort_backend,
            )
            return out

        _, vjp_fn = jax.vjp(xla_fwd, points, feats)
        dp, df = vjp_fn(g_out)
        return dp, df, None

    f.defvjp(fwd, bwd)
    return f
