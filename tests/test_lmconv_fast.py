"""Fused inference engine must match the Flax PixelCNN exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.models.lmconv import LMPixelCNN
from pixelsynth_tpu.models.lmconv_fast import pixelcnn_forward_fast
from pixelsynth_tpu.ops.orders import custom_order, masks_for_orders_batch


def test_fast_forward_matches_flax():
    B, H, W, NC = 2, 8, 8, 16
    key = jax.random.PRNGKey(0)
    model = LMPixelCNN(nr_resnet=2, nr_filters=16, input_channels=NC,
                       num_classes=NC)
    rng = np.random.default_rng(0)
    dist = rng.integers(-10, 10, (B, H, W)).astype(np.int32)
    order = custom_order(dist)
    a, b, d = masks_for_orders_batch(list(order), H, W, 3, 2)
    masks = jnp.asarray(np.stack([a, b, d], 1))

    codes = jnp.asarray(rng.integers(0, NC, (B, H, W)), jnp.int32)
    filled = jnp.asarray(rng.uniform(size=(B, H, W)) > 0.3, jnp.float32)
    oh = jax.nn.one_hot(codes, NC) * filled[..., None]
    vs = model.init({"params": key}, oh, masks[:, 0], masks[:, 1],
                    masks[:, 2], train=False)

    want = model.apply(vs, oh, masks[:, 0], masks[:, 1], masks[:, 2],
                       train=False)
    got = pixelcnn_forward_fast(
        vs["params"], codes, filled, masks[:, 0], masks[:, 1], masks[:, 2],
        nr_resnet=2, max_dilation=2, num_classes=NC, compute_dtype="float32",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=1e-3)


def test_fused_two_kernel_matches_flax():
    """The two-launch fused forward (ops/lmconv_fused.py) must agree with
    the Flax module; bf16 skip-stack carry allows a loose logits
    tolerance (sampling is softmax over 512 logits -- 1e-2 noise is far
    below temperature scale)."""
    from pixelsynth_tpu.ops.lmconv_fused import make_fused_logits_fn

    B, H, W, NC = 2, 8, 8, 16
    key = jax.random.PRNGKey(1)
    model = LMPixelCNN(nr_resnet=2, nr_filters=16, input_channels=NC,
                       num_classes=NC)
    rng = np.random.default_rng(1)
    dist = rng.integers(-10, 10, (B, H, W)).astype(np.int32)
    order = custom_order(dist)
    a, b, d = masks_for_orders_batch(list(order), H, W, 3, 2)
    masks = jnp.asarray(np.stack([a, b, d], 1))

    codes = jnp.asarray(rng.integers(0, NC, (B, H, W)), jnp.int32)
    filled = jnp.asarray(rng.uniform(size=(B, H, W)) > 0.3, jnp.float32)
    oh = jax.nn.one_hot(codes, NC) * filled[..., None]
    vs = model.init({"params": key}, oh, masks[:, 0], masks[:, 1],
                    masks[:, 2], train=False)

    want = np.asarray(model.apply(vs, oh, masks[:, 0], masks[:, 1],
                                  masks[:, 2], train=False))
    fn32 = make_fused_logits_fn(vs, masks, nr_resnet=2, max_dilation=2,
                                num_classes=NC, compute_dtype="float32")
    got32 = np.asarray(fn32(codes, filled))
    np.testing.assert_allclose(got32, want, atol=2e-2, rtol=1e-2)

    fn16 = make_fused_logits_fn(vs, masks, nr_resnet=2, max_dilation=2,
                                num_classes=NC, compute_dtype="bfloat16")
    got16 = np.asarray(fn16(codes, filled))
    # bf16 compute: argmax agreement is the operative property
    agree = (got16.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.97, f"argmax agreement {agree}"

    # positional fast path: fn.at(codes, filled, pos) must match the row
    # gathered from the full-grid forward (the AR loop consumes exactly one
    # position per image per step)
    pos = jnp.asarray(rng.integers(0, H * W, (B,)), jnp.int32)
    row = np.asarray(fn32.at(codes, filled, pos))
    full = np.asarray(fn32(codes, filled)).reshape(B, H * W, NC)
    want_row = np.take_along_axis(
        full, np.asarray(pos)[:, None, None], axis=1)[:, 0]
    np.testing.assert_allclose(row, want_row, atol=1e-4, rtol=1e-4)
