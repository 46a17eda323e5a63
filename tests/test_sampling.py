"""AR sampler tests: fast-path equivalence + sampling properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelsynth_tpu.models.lmconv import LMPixelCNN
from pixelsynth_tpu.ops.orders import custom_order, masks_for_orders_batch
from pixelsynth_tpu.sampling import ar_sample, sample_positions


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
