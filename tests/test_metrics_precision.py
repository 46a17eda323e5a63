"""SSIM numeric-correctness pin (VERDICT r3 weak #4).

TPU's default conv precision truncates inputs to bf16, which corrupted the
SSIM moment convolutions badly enough to produce out-of-range values
(committed reports held paired_ssim 2.73).  `models.losses.ssim` now forces
Precision.HIGHEST; this test pins it to a float64 numpy reference on a real
committed image and asserts the value is in range.  Runs on every backend —
on TPU it fails without the precision fix (0.751 vs 0.941 on this image).
"""

import glob
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

SCENE_DIR = os.path.join(os.path.dirname(__file__), "..", "evidence", "relay",
                         "scene_out", "scene")


def _np_ssim_f64(pred, gt, window_size=11, sigma=1.5):
    """Float64 reference: gaussian-window SSIM, zero 'same' padding,
    per-channel windows, C1/C2 = 0.01^2/0.03^2 — identical semantics to
    models/losses.py:ssim (reference models/losses/ssim.py)."""
    from scipy.signal import convolve2d

    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float64)

    def filt(x):  # (H, W, C) float64
        return np.stack([convolve2d(x[..., c], w, mode="same")
                         for c in range(x.shape[-1])], axis=-1)

    pred = pred.astype(np.float64)
    gt = gt.astype(np.float64)
    mu1, mu2 = filt(pred), filt(gt)
    s1 = filt(pred * pred) - mu1 * mu1
    s2 = filt(gt * gt) - mu2 * mu2
    s12 = filt(pred * gt) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2))
    return float(np.mean(m))


def _load_two_pngs():
    from PIL import Image

    paths = sorted(glob.glob(os.path.join(SCENE_DIR, "*.png")))
    if len(paths) < 2:
        pytest.skip("relay scene PNGs not committed")
    a = np.asarray(Image.open(paths[0]).convert("RGB"), np.float32) / 255.0
    b = np.asarray(Image.open(paths[1]).convert("RGB"), np.float32) / 255.0
    return a, b


def test_ssim_matches_float64_reference_on_real_image():
    from pixelsynth_tpu.models.losses import ssim

    a, b = _load_two_pngs()
    # self-similarity ≈ 1 and cross-similarity vs a float64 truth
    got_self = float(ssim(jnp.asarray(a[None]), jnp.asarray(a[None])))
    assert abs(got_self - 1.0) < 5e-3, got_self
    want = _np_ssim_f64(a, b)
    got = float(ssim(jnp.asarray(a[None]), jnp.asarray(b[None])))
    assert abs(got - want) < 5e-3, (got, want)


def test_ssim_in_range_on_noise():
    from pixelsynth_tpu.models.losses import ssim

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    v = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert -1.0 <= v <= 1.0, v
    # bf16 moment corruption shows up as wildly wrong noise-vs-noise SSIM
    assert abs(v) < 0.1, v
