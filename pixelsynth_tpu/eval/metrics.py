"""Evaluation metric battery.

Mirrors the reference's offline metric suite:
  * PSNR clamped at 100 with optional visibility mask
    (evaluation/metrics.py:6-19, calc_errors_quality.py:71-83);
  * SSIM (models/losses/ssim.py);
  * PercSim: VGG16 feature cosine distance with the LPIPS shift/scale
    normalization (models/networks/pretrained_networks.py:34-93);
  * FID machinery: activation statistics + Frechet distance
    (calc_errors_quality.py:135 shells out to pytorch_fid; here the
    distance is computed in-process against a pluggable feature extractor
    -- InceptionV3 ported weights for parity, any embedding for smoke);
  * Inception score and the tail rates PSNR>20 / PercSim<2.3 / SSIM>0.8
    (utils/calc_errors.py:104-283).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pixelsynth_tpu.models.losses import ssim as _ssim

# LPIPS input normalization (pretrained_networks.py:45-46)
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def psnr_clamped(pred01: jnp.ndarray, gt01: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR on [0,1] images, clamped at 100."""
    B = pred01.shape[0]
    mse = jnp.mean(((pred01 - gt01) ** 2).reshape(B, -1), axis=1)
    return jnp.minimum(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)), 100.0)


def psnr_masked(pred01, gt01, mask) -> jnp.ndarray:
    """Masked PSNR (evaluation/metrics.py PSNR w/ mask): MSE over visible
    pixels only."""
    B = pred01.shape[0]
    m = mask.reshape(B, -1, 1) if mask.ndim == 3 else mask.reshape(B, -1, mask.shape[-1])
    diff = ((pred01 - gt01) ** 2).reshape(B, -1, pred01.shape[-1])
    mse = jnp.sum(diff * m, axis=(1, 2)) / jnp.maximum(
        jnp.sum(jnp.broadcast_to(m, diff.shape), axis=(1, 2)), 1e-8
    )
    return jnp.minimum(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)), 100.0)


def ssim_metric(pred01, gt01) -> jnp.ndarray:
    return _ssim(pred01, gt01)


# ---------------------------------------------------------------------------
# PercSim (VGG16 cosine distance)
# ---------------------------------------------------------------------------

_VGG16_SLICES = (
    (64, 64),                  # relu1_2
    ("P", 128, 128),           # relu2_2
    ("P", 256, 256, 256),      # relu3_3
    ("P", 512, 512, 512),      # relu4_3
    ("P", 512, 512, 512),      # relu5_3
)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        outs = []
        h = x
        for ops in _VGG16_SLICES:
            for op in ops:
                if op == "P":
                    h = nn.max_pool(h, (2, 2), strides=(2, 2))
                else:
                    h = nn.Conv(op, (3, 3), padding=1)(h)
                    h = nn.relu(h)
            outs.append(h)
        return outs


class AlexNetFeatures(nn.Module):
    """torchvision alexnet.features sliced at each ReLU
    (pretrained_networks.py:154-194, 5 slices)."""

    @nn.compact
    def __call__(self, x):
        outs = []
        h = nn.relu(nn.Conv(64, (11, 11), strides=4, padding=2)(x))
        outs.append(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = nn.relu(nn.Conv(192, (5, 5), padding=2)(h))
        outs.append(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = nn.relu(nn.Conv(384, (3, 3), padding=1)(h))
        outs.append(h)
        h = nn.relu(nn.Conv(256, (3, 3), padding=1)(h))
        outs.append(h)
        h = nn.relu(nn.Conv(256, (3, 3), padding=1)(h))
        outs.append(h)
        return outs


class Fire(nn.Module):
    """SqueezeNet fire module: 1x1 squeeze -> (1x1 | 3x3) expand concat."""

    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=1, name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """torchvision squeezenet1_1.features sliced per
    pretrained_networks.py:95-151 (7 slices)."""

    @nn.compact
    def __call__(self, x):
        outs = []
        h = nn.relu(nn.Conv(64, (3, 3), strides=2, name="conv0")(x))
        outs.append(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = Fire(16, 64, name="fire3")(h)
        h = Fire(16, 64, name="fire4")(h)
        outs.append(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = Fire(32, 128, name="fire6")(h)
        h = Fire(32, 128, name="fire7")(h)
        outs.append(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = Fire(48, 192, name="fire9")(h)
        outs.append(h)
        h = Fire(48, 192, name="fire10")(h)
        outs.append(h)
        h = Fire(64, 256, name="fire11")(h)
        outs.append(h)
        h = Fire(64, 256, name="fire12")(h)
        outs.append(h)
        return outs


_PNET_NETS = {
    "vgg16": VGG16Features,
    "alex": AlexNetFeatures,
    "squeeze": SqueezeNetFeatures,
}


class PercSim:
    """Cosine feature distance summed over the backbone's slices
    (pretrained_networks.py:11-31 cos_sim + 72-93).  Images in [0,1].

    net: "vgg16" (the variant the PercSim metric uses,
    utils/calc_errors.py) | "alex" | "squeeze" (PNet --pnet_type)."""

    def __init__(self, variables=None, key=None, net: str = "vgg16"):
        self.net = _PNET_NETS[net]()
        if variables is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            variables = self.net.init({"params": key}, jnp.zeros((1, 64, 64, 3)))
        self.variables = variables
        self._fn = jax.jit(self._dist)

    def _dist(self, a01, b01):
        a = (a01 - LPIPS_SHIFT) / LPIPS_SCALE
        b = (b01 - LPIPS_SHIFT) / LPIPS_SCALE
        fa = self.net.apply(self.variables, a)
        fb = self.net.apply(self.variables, b)
        total = 0.0
        for x, y in zip(fa, fb):
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
            yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-10)
            cos = jnp.sum(xn * yn, axis=-1)          # (B, H, W)
            total = total + (1.0 - jnp.mean(cos.reshape(cos.shape[0], -1), axis=1))
        return total

    def __call__(self, a01, b01) -> jnp.ndarray:
        return self._fn(jnp.asarray(a01), jnp.asarray(b01))


def load_torch_vgg16(npz_path: str):
    """torchvision vgg16.features npz ('<idx>.weight') -> VGG16Features
    params."""
    raw = np.load(npz_path)
    conv_ids = sorted(int(k.split(".")[0]) for k in raw.files if k.endswith(".weight"))
    params = {}
    for i, cid in enumerate(conv_ids):
        params[f"Conv_{i}"] = {
            "kernel": jnp.asarray(raw[f"{cid}.weight"].transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(raw[f"{cid}.bias"]),
        }
    return {"params": params}


# torchvision alexnet.features has the same flat '<idx>.weight' layout
load_torch_alexnet = load_torch_vgg16


def load_torch_squeezenet(npz_path: str):
    """torchvision squeezenet1_1.features npz -> SqueezeNetFeatures params
    ('0.weight' first conv; '<i>.{squeeze,expand1x1,expand3x3}.weight'
    fire modules at indices 3,4,6,7,9,10,11,12)."""
    raw = np.load(npz_path)

    def conv(prefix):
        return {"kernel": jnp.asarray(raw[f"{prefix}.weight"].transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(raw[f"{prefix}.bias"])}

    params = {"conv0": conv("0")}
    for i in (3, 4, 6, 7, 9, 10, 11, 12):
        params[f"fire{i}"] = {
            "squeeze": conv(f"{i}.squeeze"),
            "expand1x1": conv(f"{i}.expand1x1"),
            "expand3x3": conv(f"{i}.expand3x3"),
        }
    return {"params": params}


class LPIPS:
    """Learned perceptual distance (utils/calc_errors.py:209-212 uses the
    lpips package, alex + vgg variants): channel-normalized VGG16 features,
    squared difference, per-channel learned linear weights, spatial mean.

    `lin_weights`: list of (C_l,) arrays (converted from the lpips release
    via npz: keys lin0..lin4); None -> uniform 1/C_l weights, which reduces
    to a squared-PercSim -- usable for smoke, not for published-number
    parity."""

    def __init__(self, variables=None, lin_weights=None, key=None):
        self.net = VGG16Features()
        if variables is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            variables = self.net.init({"params": key}, jnp.zeros((1, 64, 64, 3)))
        self.variables = variables
        self.lin_weights = lin_weights
        self._fn = jax.jit(self._dist)

    def _dist(self, a01, b01):
        a = (a01 - LPIPS_SHIFT) / LPIPS_SCALE
        b = (b01 - LPIPS_SHIFT) / LPIPS_SCALE
        fa = self.net.apply(self.variables, a)
        fb = self.net.apply(self.variables, b)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
            yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-10)
            d2 = (xn - yn) ** 2
            if self.lin_weights is not None:
                w = jnp.asarray(self.lin_weights[i]).reshape(1, 1, 1, -1)
                d2 = d2 * w
            else:
                d2 = d2 / d2.shape[-1]
            total = total + jnp.mean(
                jnp.sum(d2, axis=-1).reshape(d2.shape[0], -1), axis=1
            )
        return total

    def __call__(self, a01, b01) -> jnp.ndarray:
        return self._fn(jnp.asarray(a01), jnp.asarray(b01))


def load_lpips_lin_weights(npz_path: str):
    """lpips release lin layers exported as npz 'lin<i>.model.1.weight'
    (1x1 conv, (1, C, 1, 1)) -> list of (C,) arrays."""
    raw = np.load(npz_path)
    out = []
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in raw.files:
                out.append(raw[k].reshape(-1))
                break
    return out


# ---------------------------------------------------------------------------
# FID machinery
# ---------------------------------------------------------------------------


def feature_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) activations -> (mu, sigma)."""
    mu = features.mean(0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def fid_from_stats(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (pytorch_fid semantics)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def inception_score(probs: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """(N, C) class probabilities -> (mean, std) IS (utils/calc_errors.py)."""
    N = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * N // splits: (i + 1) * N // splits]
        if len(part) == 0:
            continue
        py = part.mean(0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def tail_rates(psnrs: np.ndarray, percsims: np.ndarray, ssims: np.ndarray) -> Dict[str, float]:
    """Tail fractions (utils/calc_errors.py:268-276)."""
    return {
        "psnr_gt_20": float(np.mean(psnrs > 20.0)),
        "percsim_lt_2.3": float(np.mean(percsims < 2.3)),
        "ssim_gt_0.8": float(np.mean(ssims > 0.8)),
    }
