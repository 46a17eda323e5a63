"""Tests for DMOL losses, baselines, schedulers, averaging, depth splat."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsynth_tpu.models.dmol import (
    discretized_mix_logistic_loss,
    discretized_mix_logistic_loss_1d,
    sample_from_discretized_mix_logistic,
)
from pixelsynth_tpu.models.baselines import (
    Tatarchenko,
    ViewAppearanceFlow,
    grid_sample,
)
from pixelsynth_tpu.ops.depth_splat import project_zbuffer
from pixelsynth_tpu.train.average import average_params
from pixelsynth_tpu.train.schedulers import get_schedule


def test_dmol_loss_and_sample():
    key = jax.random.PRNGKey(0)
    B, H, W, K = 2, 8, 8, 10
    x = jax.random.uniform(key, (B, H, W, 3)) * 2 - 1
    logits = jax.random.normal(key, (B, H, W, 10 * K)) * 0.1
    nll = discretized_mix_logistic_loss(x, logits)
    assert np.isfinite(float(nll))
    # bpd sanity: near-uniform init should be ~8 bits/dim for 8-bit data
    bpd = float(nll) / (B * H * W * 3 * np.log(2))
    assert 4 < bpd < 14
    g = jax.grad(lambda l: discretized_mix_logistic_loss(x, l))(logits)
    assert np.isfinite(np.asarray(g)).all()
    s = sample_from_discretized_mix_logistic(key, logits)
    assert s.shape == (B, H, W, 3)
    assert float(jnp.abs(s).max()) <= 1.0

    x1 = x[..., :1]
    l1 = jax.random.normal(key, (B, H, W, 3 * 5))
    assert np.isfinite(float(discretized_mix_logistic_loss_1d(x1, l1)))


@pytest.mark.parametrize("C,div", [(4, 13), (6, 31)])
def test_dmol_nd_loss_and_sample(C, div):
    """4-/6-channel DMOL layouts (lmconv/utils.py:92-99,422-520)."""
    from pixelsynth_tpu.models.dmol import (
        discretized_mix_logistic_loss_nd,
        sample_from_discretized_mix_logistic_nd,
    )

    key = jax.random.PRNGKey(0)
    B, H, W, K = 2, 8, 8, 12
    x = jax.random.uniform(key, (B, H, W, C)) * 2 - 1
    logits = jax.random.normal(key, (B, H, W, div * K)) * 0.1
    nll = discretized_mix_logistic_loss_nd(x, logits)
    bpd = float(nll) / (B * H * W * C * np.log(2))
    assert 4 < bpd < 14
    g = jax.grad(lambda l: discretized_mix_logistic_loss_nd(x, l))(logits)
    assert np.isfinite(np.asarray(g)).all()

    s = sample_from_discretized_mix_logistic_nd(key, logits, C)
    assert s.shape == (B, H, W, C)
    assert float(jnp.abs(s).max()) <= 1.0

    # tight mixture centered on zeros scores much better than loose
    tight = jnp.zeros((B, H, W, div * K))
    n_per = 3 if C == 4 else 5
    rest = jnp.zeros((B, H, W, C, n_per * K)).at[..., K:2 * K].set(-6.0)
    tight = tight.at[..., K:].set(rest.reshape(B, H, W, (div - 1) * K))
    zero_x = jnp.zeros((B, H, W, C))
    assert float(discretized_mix_logistic_loss_nd(zero_x, tight)) < float(
        discretized_mix_logistic_loss_nd(zero_x, jnp.zeros_like(tight)))


def test_dmol_peaked_likelihood():
    # a mixture sharply centered on the data should yield low nll
    B, H, W, K = 1, 4, 4, 10
    x = jnp.zeros((B, H, W, 3))
    logits = jnp.zeros((B, H, W, 10 * K))
    # means already 0, set log scales very negative (tight)
    rest = jnp.zeros((B, H, W, 3, 3 * K))
    rest = rest.at[..., K:2 * K].set(-6.0)
    logits = logits.at[..., K:].set(rest.reshape(B, H, W, 9 * K))
    nll_tight = float(discretized_mix_logistic_loss(x, logits))
    nll_loose = float(discretized_mix_logistic_loss(x, jnp.zeros_like(logits)))
    assert nll_tight < nll_loose


def test_grid_sample_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32)
    ys, xs = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8),
                         indexing="ij")
    grid = jnp.asarray(np.stack([xs, ys], -1)[None], jnp.float32)
    out = grid_sample(img, grid)
    np.testing.assert_allclose(out, img, atol=1e-5)


@pytest.mark.parametrize("cls", [ViewAppearanceFlow, Tatarchenko])
def test_baselines_forward(cls):
    key = jax.random.PRNGKey(0)
    model = cls()
    img = jax.random.uniform(key, (2, 256, 256, 3)) * 2 - 1
    I = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    vs = model.init({"params": key}, img, I, I, train=False)
    out = model.apply(vs, img, I, I, train=False)
    assert out.shape == (2, 256, 256, 3 if cls is Tatarchenko else 3)
    assert np.isfinite(np.asarray(out)).all()


def test_project_zbuffer_visibility():
    # two points at the same pixel: nearest wins
    pts = jnp.array([[[4.0, 4.0, 2.0], [4.0, 4.0, 5.0], [100.0, 4.0, 1.0]]])
    zbuf, vis = project_zbuffer(pts, 8)
    assert float(zbuf[0, 4, 4]) == 2.0
    assert bool(vis[0, 0]) and not bool(vis[0, 1])
    assert not bool(vis[0, 2])  # off-screen


def test_schedulers():
    for name in ("cycle", "step", "cosine", "linear", "power", "constant"):
        s = get_schedule(name, 1e-3, 100)
        v0, v50 = float(s(0)), float(s(50))
        assert np.isfinite(v0) and np.isfinite(v50)
    assert float(get_schedule("step", 1e-3, 100)(100)) < 1e-3


def test_average_params():
    a = {"w": jnp.ones((2, 2)), "b": jnp.zeros((2,))}
    b = {"w": jnp.ones((2, 2)) * 3, "b": jnp.ones((2,)) * 2}
    avg = average_params([a, b])
    np.testing.assert_allclose(avg["w"], 2.0)
    np.testing.assert_allclose(avg["b"], 1.0)
