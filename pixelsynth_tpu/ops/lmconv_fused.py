"""Two-kernel fused PixelCNN forward: the AR sampling speed-of-light path.

Round-3 profiling on the real chip: the population AR step was pinned at
~3.9 ms regardless of launch count (19 per-layer kernels vs 2 fused
launches measured identically), so the cost is *in-kernel* inefficiency of
the straightforward formulation -- per-tap pad+slice relayouts on
misaligned (H+2, W+2) windows, lane-axis concat_elu materialization, lane
slicing of the gate halves, and cross-lane PONO reductions.  This design
removes every relayout from the hot path:

  * activations live flat as (G*H*W, F); a tap shift is ONE sublane
    jnp.roll by dr*W+dc -- out-of-bounds/cross-image wraparound is folded
    into the masks OUTSIDE the kernel (the mask multiply was already
    there, so boundary handling is free);
  * concat_elu is never materialized: conv weights are pre-split into
    top/bottom halves at pack time, so each tap is two (GHW, F) @ (F, C)
    dots -- same FLOPs, no lane concatenation;
  * the gate split y[:, :F] / y[:, F:] becomes two pre-split output
    weight stacks -- no lane slicing;
  * PONO's per-position mean/var reduce over the lane axis via ONE
    (GHW, F) @ (F, 8) MXU dot against [ones, x] columns instead of
    cross-lane vector reductions.

Two launches per forward: kernel U (embed-normed input -> 9-entry skip
stack) and kernel D (8 skip-fused gated resnets + 2 dilated convs).  The
embedding-gather first layer and the 512-way output nin stay in XLA.

Exact same parameter tree as models.lmconv.LMPixelCNN; skip stack carried
bf16.  Equivalence: tests/test_lmconv_fast.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelsynth_tpu.models.layers import pono
from pixelsynth_tpu.ops.masked_conv import locally_masked_embed
from pixelsynth_tpu.ops.masked_conv_pallas import _use_interpret


def _elu_halves(x):
    """(elu(x), elu(-x)) with a single exp (Mosaic lacks expm1)."""
    e = jnp.exp(-jnp.abs(x)) - 1.0
    return jnp.where(x > 0, x, e), jnp.where(x < 0, -x, e)


def _pono_dot(x, eps=1e-5):
    """PONO over the lane (feature) axis via an MXU dot: moments from
    (GHW, F) @ (F, 2) against [1, .] columns -- no cross-lane reduction."""
    F = x.shape[-1]
    ones = jnp.ones((F, 1), jnp.float32)
    s1 = jnp.dot(x, ones, preferred_element_type=jnp.float32)
    s2 = jnp.dot(x * x, ones, preferred_element_type=jnp.float32)
    mean = s1 / F
    var = (s2 - F * mean * mean) / (F - 1)
    return (x - mean) / jnp.sqrt(var + eps)


def _shifts(k, dilation, W):
    half = k // 2
    return [((i - half) * dilation * W + (j - half) * dilation)
            for i in range(k) for j in range(k)]


def _roll(x, s):
    """Sublane roll bringing x[p+s] to position p (s static;
    pltpu.roll requires a non-negative shift)."""
    if s == 0:
        return x
    if _use_interpret():
        return jnp.roll(x, -s, 0)
    return pltpu.roll(x, (-s) % x.shape[0], 0)


def _conv_split(ha, hb, m, wa, wb, b, shifts, cdt):
    """Sigma_t m_t * (roll(ha) @ wa[t] + roll(hb) @ wb[t]); h* (GHW, F) f32
    (TPU rotate needs 32-bit data; the per-tap bf16 cast is trivial VPU),
    m (GHW, k2) f32 with boundary folded, w* (k2, F, Cout) cdt."""
    acc = None
    for t, s in enumerate(shifts):
        z = jnp.dot(_roll(ha, s).astype(cdt), wa[t],
                    preferred_element_type=jnp.float32)
        z = z + jnp.dot(_roll(hb, s).astype(cdt), wb[t],
                        preferred_element_type=jnp.float32)
        z = m[:, t][:, None] * z
        acc = z if acc is None else acc + z
    return acc + b


def _conv_split_dual(ha, hb, m, w2, b2, shifts, cdt):
    """The gated resnet's second conv: TWO output streams (activation and
    gate) over the SAME input taps.  Shares each tap's roll + bf16 cast
    between the streams (separately they would re-roll identical data --
    half the roll/cast traffic of two _conv_split calls; the dots are
    unchanged and stay output-split, no lane slicing)."""
    acc_a = acc_g = None
    for t, s in enumerate(shifts):
        ra = _roll(ha, s).astype(cdt)
        rb = _roll(hb, s).astype(cdt)
        za = jnp.dot(ra, w2["aa"][t], preferred_element_type=jnp.float32)
        za = za + jnp.dot(rb, w2["ba"][t], preferred_element_type=jnp.float32)
        zg = jnp.dot(ra, w2["ag"][t], preferred_element_type=jnp.float32)
        zg = zg + jnp.dot(rb, w2["bg"][t], preferred_element_type=jnp.float32)
        mt = m[:, t][:, None]
        za = mt * za
        zg = mt * zg
        if acc_a is None:
            acc_a, acc_g = za, zg
        else:
            acc_a, acc_g = acc_a + za, acc_g + zg
    return acc_a + b2[0], acc_g + b2[1]


def _conv_single(h, m, w, b, shifts, cdt):
    """Single-stream masked conv (the dilated layers); h (GHW, F) f32."""
    acc = None
    for t, s in enumerate(shifts):
        z = jnp.dot(_roll(h, s).astype(cdt), w[t],
                    preferred_element_type=jnp.float32)
        z = m[:, t][:, None] * z
        acc = z if acc is None else acc + z
    return acc + b


def _gated(og, a, m, w1a, w1b, b1, wsa, wsb, bs, w2, b2, *, F, shifts, cdt):
    """One gated resnet, flat layout (lmconv/layers.py:136-163).

    w1a/w1b: (k2, F, F); w2: dict with aa/ba/ag/bg (k2, F, F) output-split
    second conv; b2: (2F,) split into (ba2, bg2)."""
    xa, xb = _elu_halves(og)
    x = _conv_split(xa, xb, m, w1a, w1b, b1, shifts, cdt)
    x = _pono_dot(x)
    if a is not None:
        aa, ab = _elu_halves(a)
        sk = jnp.dot(aa.astype(cdt), wsa, preferred_element_type=jnp.float32)
        sk = sk + jnp.dot(ab.astype(cdt), wsb,
                          preferred_element_type=jnp.float32)
        x = x + sk + bs
    ya, yb = _elu_halves(x)
    z_a, z_g = _conv_split_dual(ya, yb, m, w2, b2, shifts, cdt)
    return og + _pono_dot(z_a) * jax.nn.sigmoid(z_g)


def _up_kernel(u0_ref, mu_ref, md_ref, w_refs, out_ref, *, G, HW, F, nr,
               shifts1, shiftsd, cdt):
    (w1a_ref, w1b_ref, b1_ref, w2aa_ref, w2ba_ref, w2ag_ref, w2bg_ref,
     b2a_ref, b2g_ref, dw_ref, db_ref) = w_refs
    mu = mu_ref[0]
    md = md_ref[0]
    u = u0_ref[0].astype(jnp.float32)
    out_ref[0, 0] = u.astype(out_ref.dtype)
    g = 0
    s = 1
    for blk in range(3):
        for _ in range(nr):
            w2 = {"aa": w2aa_ref[g], "ba": w2ba_ref[g],
                  "ag": w2ag_ref[g], "bg": w2bg_ref[g]}
            u = _gated(u, None, mu, w1a_ref[g], w1b_ref[g], b1_ref[g],
                       None, None, None, w2, (b2a_ref[g], b2g_ref[g]),
                       F=F, shifts=shifts1, cdt=cdt)
            out_ref[0, s] = u.astype(out_ref.dtype)
            g += 1
            s += 1
        if blk < 2:
            u = _conv_single(u, md, dw_ref[blk], db_ref[blk], shiftsd, cdt)
            u = _pono_dot(u)
            out_ref[0, s] = u.astype(out_ref.dtype)
            s += 1


def _down_kernel(stack_ref, mu_ref, md_ref, w_refs, out_ref, *, G, HW, F,
                 nr, shifts1, shiftsd, cdt):
    (w1a_ref, w1b_ref, b1_ref, wsa_ref, wsb_ref, bs_ref, w2aa_ref, w2ba_ref,
     w2ag_ref, w2bg_ref, b2a_ref, b2g_ref, dw_ref, db_ref) = w_refs
    mu = mu_ref[0]
    md = md_ref[0]

    def pop(i):
        return stack_ref[0, i].astype(jnp.float32)

    down_nr = [nr, nr + 1, nr + 1]
    u = pop(3 * nr + 2)
    top = 3 * nr + 1
    g = 0
    for i in range(3):
        for _ in range(down_nr[i]):
            w2 = {"aa": w2aa_ref[g], "ba": w2ba_ref[g],
                  "ag": w2ag_ref[g], "bg": w2bg_ref[g]}
            u = _gated(u, pop(top), mu, w1a_ref[g], w1b_ref[g], b1_ref[g],
                       wsa_ref[g], wsb_ref[g], bs_ref[g], w2,
                       (b2a_ref[g], b2g_ref[g]), F=F, shifts=shifts1,
                       cdt=cdt)
            g += 1
            top -= 1
        if i < 2:
            u = _conv_single(u, md, dw_ref[i], db_ref[i], shiftsd, cdt)
            u = _pono_dot(u)
    out_ref[0] = u


@functools.partial(jax.jit, static_argnames=("nr_resnet", "compute_dtype"))
def pack_lmconv_params(params: Dict, *, nr_resnet: int = 2,
                       compute_dtype: str = "bfloat16") -> Dict:
    """LMPixelCNN params -> split/stacked weight arrays for the fused
    kernels.  Call ONCE outside the sampling loop (jitted: the ~100
    stack/slice/cast ops cost ~0.5 s per call when dispatched eagerly
    through a remote-device tunnel — measured 25% of a whole view step)."""
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    nr = nr_resnet
    n_up = 3 * nr
    n_down = 3 * nr + 2
    F = params["LMConv_0"]["bias"].shape[0]

    def gw(i):
        return params[f"GatedResnet_{i}"]

    def split_w1(rng_):
        """(n, k2, 2F, F) -> top/bottom input halves."""
        w = jnp.stack([gw(i)["LMConv_0"]["weight"] for i in rng_])
        return w[:, :, :F].astype(cdt), w[:, :, F:].astype(cdt)

    def split_w2(rng_):
        """(n, k2, 2F, 2F) -> input halves x output (a, gate) halves."""
        w = jnp.stack([gw(i)["LMConv_1"]["weight"] for i in rng_])
        return {
            "aa": w[:, :, :F, :F].astype(cdt),
            "ba": w[:, :, F:, :F].astype(cdt),
            "ag": w[:, :, :F, F:].astype(cdt),
            "bg": w[:, :, F:, F:].astype(cdt),
        }

    up_r = range(n_up)
    dn_r = range(n_up, n_up + n_down)
    uw1a, uw1b = split_w1(up_r)
    dw1a, dw1b = split_w1(dn_r)
    uw2 = split_w2(up_r)
    dw2 = split_w2(dn_r)
    ws = jnp.stack([gw(i)["Nin_0"]["Dense_0"]["kernel"] for i in dn_r])
    packed = {
        "uw1a": uw1a, "uw1b": uw1b,
        "ub1": jnp.stack([gw(i)["LMConv_0"]["bias"] for i in up_r]),
        "uw2aa": uw2["aa"], "uw2ba": uw2["ba"],
        "uw2ag": uw2["ag"], "uw2bg": uw2["bg"],
        "ub2a": jnp.stack([gw(i)["LMConv_1"]["bias"][:F] for i in up_r]),
        "ub2g": jnp.stack([gw(i)["LMConv_1"]["bias"][F:] for i in up_r]),
        "udw": jnp.stack([params[f"LMConv_{1 + i}"]["weight"]
                          for i in range(2)]).astype(cdt),
        "udb": jnp.stack([params[f"LMConv_{1 + i}"]["bias"]
                          for i in range(2)]),
        "dw1a": dw1a, "dw1b": dw1b,
        "db1": jnp.stack([gw(i)["LMConv_0"]["bias"] for i in dn_r]),
        "dwsa": ws[:, :F].astype(cdt), "dwsb": ws[:, F:].astype(cdt),
        "dbs": jnp.stack([gw(i)["Nin_0"]["Dense_0"]["bias"] for i in dn_r]),
        "dw2aa": dw2["aa"], "dw2ba": dw2["ba"],
        "dw2ag": dw2["ag"], "dw2bg": dw2["bg"],
        "db2a": jnp.stack([gw(i)["LMConv_1"]["bias"][:F] for i in dn_r]),
        "db2g": jnp.stack([gw(i)["LMConv_1"]["bias"][F:] for i in dn_r]),
        "ddw": jnp.stack([params[f"LMConv_{3 + i}"]["weight"]
                          for i in range(2)]).astype(cdt),
        "ddb": jnp.stack([params[f"LMConv_{3 + i}"]["bias"]
                          for i in range(2)]),
        "embed_w": params["LMConv_0"]["weight"],
        "embed_b": params["LMConv_0"]["bias"],
        "nin_w": params["Nin_0"]["Dense_0"]["kernel"],
        "nin_b": params["Nin_0"]["Dense_0"]["bias"],
    }
    return packed


def fold_boundary_masks(mask: jnp.ndarray, H: int, W: int, k: int,
                        dilation: int) -> jnp.ndarray:
    """(B, k2, HW) -> (B, HW, k2) f32 with out-of-bounds taps zeroed.

    The kernels shift via flat roll, so wraparound (image edge AND
    cross-image) must be masked here; matches zero-padding semantics of
    the reference unfold (locally_masked_convolution.py:25-39)."""
    half = k // 2
    rows = np.arange(H * W) // W
    cols = np.arange(H * W) % W
    valid = np.ones((H * W, k * k), np.float32)
    for i in range(k):
        for j in range(k):
            dr = (i - half) * dilation
            dc = (j - half) * dilation
            ok = ((rows + dr >= 0) & (rows + dr < H)
                  & (cols + dc >= 0) & (cols + dc < W))
            valid[:, i * k + j] = ok
    return jnp.swapaxes(mask, 1, 2) * jnp.asarray(valid)[None]


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "nr_resnet", "max_dilation", "num_classes",
                     "compute_dtype", "return_features"),
)
def pixelcnn_forward_fused(
    packed: Dict,
    codes: jnp.ndarray,
    filled: jnp.ndarray,
    mask_init: jnp.ndarray,
    mu: jnp.ndarray,
    md: jnp.ndarray,
    *,
    H: int,
    W: int,
    nr_resnet: int = 2,
    max_dilation: int = 2,
    num_classes: int = 512,
    compute_dtype: str = "bfloat16",
    return_features: bool = False,
) -> jnp.ndarray:
    """codes/filled: (B, H, W); mask_init: (B, k2, HW) (embed layout);
    mu/md: boundary-folded (B, HW, k2) f32 (fold_boundary_masks).
    Returns (B, H, W, num_classes) logits, or the pre-nin features
    (B, HW, F) f32 when return_features (the AR loop consumes logits at
    ONE position per image -- materializing the full (B, HW, 512) nin
    output every step is pure HBM+MXU waste)."""
    B = codes.shape[0]
    F = packed["ub1"].shape[-1]
    K2 = packed["uw1a"].shape[1]
    k = int(round(K2 ** 0.5))
    nr = nr_resnet
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    n_stack = 3 * nr + 3
    HW = H * W
    shifts1 = _shifts(k, 1, W)
    shiftsd = _shifts(k, max_dilation, W)

    u0 = locally_masked_embed(codes, filled, mask_init, packed["embed_w"],
                              packed["embed_b"], num_classes=num_classes)
    u0 = pono(u0).reshape(B, HW, F)

    interpret = _use_interpret()
    vm = pltpu.VMEM

    def wspec(name):
        arr = packed[name]
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda b, nd=nd: (0,) * nd,
                            memory_space=vm)

    up_w_names = ["uw1a", "uw1b", "ub1", "uw2aa", "uw2ba", "uw2ag", "uw2bg",
                  "ub2a", "ub2g", "udw", "udb"]
    n_down = 3 * nr + 2

    def up_body(u0_ref, mu_ref, md_ref, *w_refs):
        return functools.partial(
            _up_kernel, G=1, HW=HW, F=F, nr=nr, shifts1=shifts1,
            shiftsd=shiftsd, cdt=cdt,
        )(u0_ref, mu_ref, md_ref, w_refs[:-1], w_refs[-1])

    up = pl.pallas_call(
        lambda *refs: up_body(*refs),
        out_shape=jax.ShapeDtypeStruct((B, n_stack, HW, F), jnp.bfloat16),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, F), lambda b: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, HW, K2), lambda b: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, HW, K2), lambda b: (b, 0, 0), memory_space=vm),
        ] + [wspec(n) for n in up_w_names],
        out_specs=pl.BlockSpec((1, n_stack, HW, F), lambda b: (b, 0, 0, 0),
                               memory_space=vm),
        interpret=interpret,
    )(u0.astype(jnp.float32), mu, md, *[packed[n] for n in up_w_names])

    down_w_names = ["dw1a", "dw1b", "db1", "dwsa", "dwsb", "dbs", "dw2aa",
                    "dw2ba", "dw2ag", "dw2bg", "db2a", "db2g", "ddw", "ddb"]

    def down_body(stack_ref, mu_ref, md_ref, *w_refs):
        return functools.partial(
            _down_kernel, G=1, HW=HW, F=F, nr=nr, shifts1=shifts1,
            shiftsd=shiftsd, cdt=cdt,
        )(stack_ref, mu_ref, md_ref, w_refs[:-1], w_refs[-1])

    u = pl.pallas_call(
        lambda *refs: down_body(*refs),
        out_shape=jax.ShapeDtypeStruct((B, HW, F), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n_stack, HW, F), lambda b: (b, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, HW, K2), lambda b: (b, 0, 0), memory_space=vm),
            pl.BlockSpec((1, HW, K2), lambda b: (b, 0, 0), memory_space=vm),
        ] + [wspec(n) for n in down_w_names],
        out_specs=pl.BlockSpec((1, HW, F), lambda b: (b, 0, 0),
                               memory_space=vm),
        interpret=interpret,
    )(up, mu, md, *[packed[n] for n in down_w_names])

    if return_features:
        return u
    h = jax.nn.elu(u)
    logits = jnp.einsum("bpf,fc->bpc", h, packed["nin_w"],
                        preferred_element_type=jnp.float32) + packed["nin_b"]
    return logits.reshape(B, H, W, num_classes)


def make_fused_logits_fn(pcnn_vars: Dict, masks: jnp.ndarray, *,
                         nr_resnet: int = 2, max_dilation: int = 2,
                         num_classes: int = 512,
                         compute_dtype: str = "bfloat16",
                         packed: Dict = None) -> Callable:
    """masks: (B, 3, k2, HW) triple -> (codes, filled) -> logits.

    Packs/splits weights and boundary-folds the masks once, so the AR
    loop body is exactly: embed -> kernel U -> kernel D -> nin.  Pass a
    pre-packed weight dict (pack_lmconv_params) when building fresh
    logits fns for many views of the same model."""
    if packed is None:
        packed = pack_lmconv_params(pcnn_vars["params"], nr_resnet=nr_resnet,
                                    compute_dtype=compute_dtype)
    B, _, K2, HW = masks.shape
    k = int(round(K2 ** 0.5))
    side = int(round(HW ** 0.5))
    m_init = masks[:, 0]
    mu = fold_boundary_masks(jnp.asarray(masks[:, 1], jnp.float32),
                             side, side, k, 1)
    md = fold_boundary_masks(jnp.asarray(masks[:, 2], jnp.float32),
                             side, side, k, max_dilation)

    def fn(codes, filled):
        return pixelcnn_forward_fused(
            packed, codes, filled, m_init, mu, md, H=side, W=side,
            nr_resnet=nr_resnet, max_dilation=max_dilation,
            num_classes=num_classes, compute_dtype=compute_dtype,
        )

    def at(codes, filled, pos):
        """Logits at selected flat positions per image: pos (B,) -> (B, C)
        or (B, G) -> (B, G, C).

        Skips the full-grid nin einsum (and its (B, HW, C) HBM
        materialization); only the gathered feature rows go through
        elu + nin."""
        u = pixelcnn_forward_fused(
            packed, codes, filled, m_init, mu, md, H=side, W=side,
            nr_resnet=nr_resnet, max_dilation=max_dilation,
            num_classes=num_classes, compute_dtype=compute_dtype,
            return_features=True,
        )
        single = pos.ndim == 1
        p2 = pos[:, None] if single else pos                 # (B, G)
        rows = jnp.take_along_axis(
            u, p2[:, :, None].astype(jnp.int32), axis=1)     # (B, G, F)
        h = jax.nn.elu(rows)
        out = jnp.dot(h, packed["nin_w"],
                      preferred_element_type=jnp.float32) + packed["nin_b"]
        return out[:, 0] if single else out

    fn.at = at
    return fn
