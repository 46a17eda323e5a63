"""AR sampler tests: fast-path equivalence + sampling properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsynth_tpu.models.lmconv import LMPixelCNN
from pixelsynth_tpu.ops.orders import custom_order, masks_for_orders_batch
from pixelsynth_tpu.sampling import (
    ar_sample,
    ar_sample_speculative,
    sample_positions,
)


@pytest.fixture(scope="module")
def setup():
    B, H, W, NC = 2, 8, 8, 16
    key = jax.random.PRNGKey(0)
    model = LMPixelCNN(nr_resnet=1, nr_filters=8, input_channels=NC,
                       num_classes=NC)
    bg = np.zeros((B, H, W), np.float32)
    bg[:, :, 4:] = 1.0
    dist = ((1 - bg) * 3 - bg * 2).astype(np.int32)
    order = custom_order(dist)
    a, b, d = masks_for_orders_batch(list(order), H, W, 3, 2)
    masks = jnp.asarray(np.stack([a, b, d], 1))
    oh = jax.nn.one_hot(jnp.zeros((B, H, W), jnp.int32), NC)
    variables = model.init({"params": key}, oh, masks[:, 0], masks[:, 1],
                           masks[:, 2], train=False)
    return model, variables, masks, order, bg, (B, H, W, NC)


def test_embed_fast_path_matches_onehot(setup):
    model, variables, masks, order, bg, (B, H, W, NC) = setup
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, NC, (B, H, W)), jnp.int32)
    filled = jnp.asarray(rng.uniform(size=(B, H, W)) > 0.3, jnp.float32)
    oh = jax.nn.one_hot(codes, NC) * filled[..., None]
    dense = model.apply(variables, oh, masks[:, 0], masks[:, 1], masks[:, 2],
                        train=False)
    fast = model.apply(variables, None, masks[:, 0], masks[:, 1], masks[:, 2],
                       codes=codes, filled=filled, train=False)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(fast),
                               atol=2e-5, rtol=1e-4)


def test_ar_sample_properties(setup):
    model, variables, masks, order, bg, (B, H, W, NC) = setup
    key = jax.random.PRNGKey(5)

    def logits_fn(cur, filled):
        return model.apply(variables, None, masks[:, 0], masks[:, 1],
                           masks[:, 2], codes=cur, filled=filled, train=False)

    codes = jnp.full((B, H, W), 3, jnp.int32)
    pos, nbg = sample_positions(jnp.asarray(order), jnp.asarray(bg))
    assert nbg.tolist() == [32, 32]

    out = np.asarray(ar_sample(logits_fn, codes, jnp.asarray(order),
                               jnp.asarray(bg), key, num_classes=NC))
    assert np.all(out[:, :, :4] == 3)          # foreground preserved
    out2 = np.asarray(ar_sample(logits_fn, codes, jnp.asarray(order),
                                jnp.asarray(bg), key, num_classes=NC))
    np.testing.assert_array_equal(out, out2)   # deterministic per key
    out3 = np.asarray(ar_sample(logits_fn, codes, jnp.asarray(order),
                                jnp.asarray(bg), jax.random.PRNGKey(9),
                                num_classes=NC))
    assert not np.array_equal(out, out3)       # key changes samples


def test_ar_sample_positional_logits_path(setup):
    """A logits_fn carrying `.at` (the fused-backend positional fast path)
    must produce the same samples as the gather-from-full-grid path."""
    model, variables, masks, order, bg, (B, H, W, NC) = setup
    key = jax.random.PRNGKey(5)

    def logits_fn(cur, filled):
        return model.apply(variables, None, masks[:, 0], masks[:, 1],
                           masks[:, 2], codes=cur, filled=filled, train=False)

    def at(cur, filled, pos):
        logits = logits_fn(cur, filled).reshape(B, H * W, NC)
        return jnp.take_along_axis(
            logits, pos[:, None, None].astype(jnp.int32), axis=1)[:, 0]

    logits_fn_at = lambda cur, filled: logits_fn(cur, filled)  # noqa: E731
    logits_fn_at.at = at

    codes = jnp.full((B, H, W), 3, jnp.int32)
    want = np.asarray(ar_sample(logits_fn, codes, jnp.asarray(order),
                                jnp.asarray(bg), key, num_classes=NC))
    got = np.asarray(ar_sample(logits_fn_at, codes, jnp.asarray(order),
                               jnp.asarray(bg), key, num_classes=NC))
    np.testing.assert_array_equal(want, got)


def _attach_at(logits_fn, B, HW, NC):
    """Give a full-grid logits_fn the `.at` multi-position protocol."""

    def at(cur, filled, pos):
        logits = logits_fn(cur, filled).reshape(B, HW, NC)
        single = pos.ndim == 1
        p2 = pos[:, None] if single else pos
        out = jnp.take_along_axis(logits, p2[..., None].astype(jnp.int32),
                                  axis=1)
        return out[:, 0] if single else out

    logits_fn.at = at
    return logits_fn


def test_speculative_properties(setup):
    model, variables, masks, order, bg, (B, H, W, NC) = setup

    def logits_fn(cur, filled):
        return model.apply(variables, None, masks[:, 0], masks[:, 1],
                           masks[:, 2], codes=cur, filled=filled, train=False)

    _attach_at(logits_fn, B, H * W, NC)
    codes = jnp.full((B, H, W), 3, jnp.int32)
    key = jax.random.PRNGKey(11)
    out = np.asarray(ar_sample_speculative(
        logits_fn, codes, jnp.asarray(order), jnp.asarray(bg), key,
        num_classes=NC, temperature=0.7, spec=3))
    assert np.all(out[:, :, :4] == 3)          # foreground preserved
    out2 = np.asarray(ar_sample_speculative(
        logits_fn, codes, jnp.asarray(order), jnp.asarray(bg), key,
        num_classes=NC, temperature=0.7, spec=3))
    np.testing.assert_array_equal(out, out2)   # deterministic per key
    out3 = np.asarray(ar_sample_speculative(
        logits_fn, codes, jnp.asarray(order), jnp.asarray(bg),
        jax.random.PRNGKey(12), num_classes=NC, temperature=0.7, spec=3))
    assert not np.array_equal(out, out3)


def test_speculative_matches_sequential_at_low_temperature(setup):
    """T -> 0 makes every conditional deterministic (argmax chain); the
    speculative and sequential samplers must then agree exactly.  A
    random-init model's logits are nearly flat (gaps ~0.1), so T must be
    small enough that gap/T >> 1 -- 1e-4 gives softmax ratios of e^1000."""
    model, variables, masks, order, bg, (B, H, W, NC) = setup

    def logits_fn(cur, filled):
        return model.apply(variables, None, masks[:, 0], masks[:, 1],
                           masks[:, 2], codes=cur, filled=filled, train=False)

    _attach_at(logits_fn, B, H * W, NC)
    codes = jnp.full((B, H, W), 3, jnp.int32)
    seq = np.asarray(ar_sample(logits_fn, codes, jnp.asarray(order),
                               jnp.asarray(bg), jax.random.PRNGKey(0),
                               num_classes=NC, temperature=1e-4))
    # 12 is the r5 product default (evidence/spec_sweep_r5.json)
    for spec in (1, 3, 12):
        spc = np.asarray(ar_sample_speculative(
            logits_fn, codes, jnp.asarray(order), jnp.asarray(bg),
            jax.random.PRNGKey(4), num_classes=NC, temperature=1e-4,
            spec=spec))
        np.testing.assert_array_equal(seq, spc)


def test_speculative_exact_joint_two_cell_chain():
    """Analytic exactness: a 2-cell chain whose second conditional depends
    on the first cell's committed value.  The speculative path must hit
    the analytic joint -- this drives the accept/reject + residual
    resample machinery for real (the draft for cell 1 is sampled from the
    stale no-context distribution, so acceptance is genuinely < 1)."""
    B, H, W, NC, T = 4096, 2, 2, 2, 1.0
    HW = H * W
    th0, tha, thb, thc = 0.8, 1.5, -1.2, 0.3
    l_p0 = jnp.array([0.0, th0])
    la, lb, lc = (jnp.array([0.0, t]) for t in (tha, thb, thc))

    def logits_fn(cur, filled):
        raise AssertionError("full-grid path must not be used")

    def at(cur, filled, pos):
        c = cur.reshape(B, HW)
        f = filled.reshape(B, HW)
        x0, f0 = c[:, 0], f[:, 0]
        row1 = jnp.where(f0[:, None] > 0,
                         jnp.where((x0 == 1)[:, None], la, lb), lc)
        table = jnp.stack(
            [jnp.broadcast_to(l_p0, (B, NC)), row1,
             jnp.zeros((B, NC)), jnp.zeros((B, NC))], axis=1)
        return jnp.take_along_axis(table, pos[..., None].astype(jnp.int32),
                                   axis=1)

    logits_fn.at = at

    order = np.zeros((B, HW, 2), np.int32)
    order[:, 0] = (0, 0)
    order[:, 1] = (0, 1)
    order[:, 2] = (1, 0)
    order[:, 3] = (1, 1)
    bg = np.zeros((B, H, W), np.float32)
    bg[:, 0, :] = 1.0  # cells (0,0) and (0,1) are background

    out = np.asarray(ar_sample_speculative(
        logits_fn, jnp.zeros((B, H, W), jnp.int32), jnp.asarray(order),
        jnp.asarray(bg), jax.random.PRNGKey(7), num_classes=NC,
        temperature=T, spec=2))
    x0, x1 = out[:, 0, 0], out[:, 0, 1]

    def sm(th):
        return np.exp(th) / (1.0 + np.exp(th))

    p0 = sm(th0)
    joint = {
        (0, 0): (1 - p0) * (1 - sm(thb)), (0, 1): (1 - p0) * sm(thb),
        (1, 0): p0 * (1 - sm(tha)), (1, 1): p0 * sm(tha),
    }
    for (a, b2), want in joint.items():
        got = float(np.mean((x0 == a) & (x1 == b2)))
        assert abs(got - want) < 0.035, f"joint{(a, b2)}: {got} vs {want}"


def test_ar_sample_empty_background(setup):
    model, variables, masks, order, bg, (B, H, W, NC) = setup

    def logits_fn(cur, filled):
        return model.apply(variables, None, masks[:, 0], masks[:, 1],
                           masks[:, 2], codes=cur, filled=filled, train=False)

    codes = jnp.full((B, H, W), 7, jnp.int32)
    none_bg = jnp.zeros((B, H, W))
    out = np.asarray(ar_sample(logits_fn, codes, jnp.asarray(order), none_bg,
                               jax.random.PRNGKey(0), num_classes=NC))
    np.testing.assert_array_equal(out, 7)      # nothing to sample -> no-op
