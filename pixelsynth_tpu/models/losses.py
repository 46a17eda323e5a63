"""Loss stack: synthesis (L1 + VGG perceptual + PSNR/SSIM metrics), hinge
GAN loss with feature matching, and the discriminator step helpers.

Mirrors:
  * SynthesisLoss / PerceptualLoss / PSNR (models/losses/synthesis.py:10-104)
  * ssim (models/losses/ssim.py -- standard gaussian-window SSIM)
  * GANLoss hinge + feature matching + the generator/discriminator step
    split (models/losses/gan_loss.py:81-285)
  * VGG19 feature slices (models/networks/architectures.py:52-85)

The VGG19 runs with ported torchvision weights when available
(`load_torch_vgg19` -- converted once, stored as npz); otherwise it falls
back to fixed random features (a random VGG is still a usable perceptual
metric for smoke tests; parity evals require the ported weights).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# VGG19 feature extractor
# ---------------------------------------------------------------------------

# torchvision vgg19.features conv layout per slice (architectures.py:63-72):
# slice1: conv1_1..relu ; slice2: conv1_2..relu2_1 ; slice3: ..relu3_1 ;
# slice4: ..relu4_1 ; slice5: ..relu5_1
_VGG_SLICES: Sequence[Sequence[int]] = (
    (64,),                       # conv1_1
    (64, "P", 128),              # conv1_2, pool, conv2_1
    (128, "P", 256),             # conv2_2, pool, conv3_1
    (256, 256, 256, "P", 512),   # conv3_2..conv3_4, pool, conv4_1
    (512, 512, 512, "P", 512),   # conv4_2..conv4_4, pool, conv5_1
)


class VGG19Features(nn.Module):
    """Returns the 5 relu slices used by the SPADE-style perceptual loss."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        h = x
        for ops in _VGG_SLICES:
            for op in ops:
                if op == "P":
                    h = nn.max_pool(h, (2, 2), strides=(2, 2))
                else:
                    h = nn.Conv(op, (3, 3), padding=1)(h)
                    h = nn.relu(h)
            outs.append(h)
        return outs


def load_torch_vgg19(npz_path: str):
    """Convert torchvision vgg19.features weights (saved as npz of
    '<idx>.weight'/'<idx>.bias' OIHW arrays) into VGG19Features params."""
    raw = np.load(npz_path)
    conv_ids = sorted(
        int(k.split(".")[0]) for k in raw.files if k.endswith(".weight")
    )
    params: Dict = {}
    i = 0
    for cid in conv_ids:
        w = raw[f"{cid}.weight"]  # (O, I, H, W)
        b = raw[f"{cid}.bias"]
        params[f"Conv_{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
        i += 1
    return {"params": params}


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Reference PSNR (synthesis.py:60-66): MSE summed over channels,
    averaged over pixels, per image, then 10*log10(1/mse) averaged."""
    B = pred.shape[0]
    mse = jnp.mean(jnp.sum((pred - gt) ** 2, axis=-1).reshape(B, -1), axis=1)
    return jnp.mean(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-10)))


@functools.lru_cache(maxsize=4)
def _gaussian_window(size: int, sigma: float):
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


def ssim(pred: jnp.ndarray, gt: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Gaussian-window SSIM (models/losses/ssim.py semantics), NHWC.

    The window convolutions run at Precision.HIGHEST in float32: TPU's
    default conv precision truncates inputs to bf16, which corrupts the
    variance terms (s1/s2 are small differences of large moments) badly
    enough to push SSIM outside [-1, 1] on real images.
    """
    C = pred.shape[-1]
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    w = jnp.asarray(_gaussian_window(window_size, 1.5))
    kernel = jnp.zeros((window_size, window_size, 1, C))
    for c in range(C):
        kernel = kernel.at[:, :, 0, c].set(w)

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=[(window_size // 2, window_size // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )

    mu1, mu2 = filt(pred), filt(gt)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(pred * pred) - mu1_sq
    s2 = filt(gt * gt) - mu2_sq
    s12 = filt(pred * gt) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(m)


# ---------------------------------------------------------------------------
# synthesis loss
# ---------------------------------------------------------------------------

PERCEPTUAL_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def perceptual_loss(vgg_apply, pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """SPADE-style multiscale VGG L1 (synthesis.py:85-104)."""
    pf = vgg_apply(pred)
    gf = vgg_apply(jax.lax.stop_gradient(gt))
    loss = 0.0
    for w, p, g in zip(PERCEPTUAL_WEIGHTS, pf, gf):
        loss = loss + w * jnp.mean(jnp.abs(p - g))
    return loss


def synthesis_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    *,
    losses: Sequence[str] = ("1.0_l1", "10.0_content"),
    vgg_apply=None,
) -> Dict[str, jnp.ndarray]:
    """Weighted loss list "lambda_name" -> dict with "Total Loss" + PSNR/SSIM
    (synthesis.py:10-57)."""
    out: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for spec in losses:
        lam_s, name = spec.split("_", 1)
        lam = float(lam_s)
        if name == "l1":
            v = jnp.mean(jnp.abs(pred - gt))
            out["L1"] = v
        elif name == "content":
            if vgg_apply is None:
                continue
            v = perceptual_loss(vgg_apply, pred, gt)
            out["Perceptual"] = v
        else:
            raise ValueError(f"unknown loss {name}")
        total = total + lam * v
    out["psnr"] = psnr(pred, gt)
    # standard [0,1]-range per-channel PSNR alongside the reference's
    # channel-summed [-1,1] convention (the two differ by ~10.8 dB;
    # curves are unreadable without both)
    p01, g01 = pred * 0.5 + 0.5, gt * 0.5 + 0.5
    mse01 = jnp.maximum(jnp.mean((p01 - g01) ** 2), 1e-10)
    out["psnr_std"] = 10.0 * jnp.log10(1.0 / mse01)
    # reference convention feeds [-1,1] images into SSIM whose C1/C2 are
    # [0,1]-range constants (synthesis.py:71) -- numerically unstable
    # (near-zero local variance sums blow past [0,1]); keep it for parity
    # but also log the stable standard-range value
    out["ssim"] = ssim(pred, gt)
    out["ssim_std"] = ssim(p01, g01)
    out["Total Loss"] = total
    return out


# ---------------------------------------------------------------------------
# GAN losses (hinge) + feature matching
# ---------------------------------------------------------------------------


def _scale_final(preds: List[List[jnp.ndarray]]) -> List[jnp.ndarray]:
    return [p[-1] for p in preds]


def hinge_d_loss(pred_fake, pred_real) -> Dict[str, jnp.ndarray]:
    """Discriminator hinge loss over multiscale outputs (gan_loss.py:81-94,
    averaged across scales per gan_loss.py:103-115)."""
    d_fake = jnp.mean(
        jnp.stack([jnp.mean(nn.relu(1.0 + f)) for f in _scale_final(pred_fake)])
    )
    d_real = jnp.mean(
        jnp.stack([jnp.mean(nn.relu(1.0 - r)) for r in _scale_final(pred_real)])
    )
    return {"D_Fake": d_fake, "D_real": d_real, "Total Loss": d_fake + d_real}


def hinge_g_loss(
    pred_fake, pred_real, *, lambda_feat: float = 10.0, feat_match: bool = True
) -> Dict[str, jnp.ndarray]:
    """Generator hinge + feature matching (gan_loss.py:190-215)."""
    gan = jnp.mean(jnp.stack([-jnp.mean(f) for f in _scale_final(pred_fake)]))
    out = {"GAN": gan}
    total = gan
    if feat_match:
        num_D = len(pred_fake)
        fm = 0.0
        for pf, pr in zip(pred_fake, pred_real):
            for f, r in zip(pf[:-1], pr[:-1]):
                fm = fm + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r))) * (
                    lambda_feat / num_D
                )
        out["GAN_Feat"] = fm
        total = total + fm
    out["Total Loss"] = total
    return out


def discriminator_scores(disc_apply, fake, real, *, train: bool = True):
    """Run D on the fake||real concat batch and split predictions
    (gan_loss.py:141-169: shared batch so BN statistics match)."""
    both = jnp.concatenate([fake, real], axis=0)
    preds = disc_apply(both, train=train)
    half = fake.shape[0]
    pred_fake = [[t[:half] for t in scale] for scale in preds]
    pred_real = [[t[half:] for t in scale] for scale in preds]
    return pred_fake, pred_real
