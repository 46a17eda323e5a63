"""Mesh sharding tests on the virtual 8-device CPU mesh: the candidate
population advances in one sampling loop sharded over the data axis
(BASELINE.json: "6-direction outpaint ... one sharded sampling loop")."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pixelsynth_tpu.models.lmconv import LMPixelCNN
from pixelsynth_tpu.ops.orders import custom_order, masks_for_orders_batch
from pixelsynth_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from pixelsynth_tpu.sampling import ar_sample


def test_population_sampling_sharded_over_mesh():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    B, H, W, NC = 8, 8, 8, 16  # one candidate per device
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
    vs = model.init({"params": key}, oh, masks[:, 0], masks[:, 1],
                    masks[:, 2], train=False)

    codes = jnp.full((B, H, W), 3, jnp.int32)

    def run(vs, masks, codes, order, bg):
        def logits_fn(c, f):
            return model.apply(vs, None, masks[:, 0], masks[:, 1],
                               masks[:, 2], codes=c, filled=f, train=False)

        return ar_sample(logits_fn, codes, order, bg, jax.random.PRNGKey(7),
                         num_classes=NC)

    # reference output (unsharded)
    want = np.asarray(run(vs, masks, codes, jnp.asarray(order), jnp.asarray(bg)))

    with mesh:
        vs_r = replicate(vs, mesh)
        masks_s = shard_batch(masks, mesh)
        codes_s = shard_batch(codes, mesh)
        order_s = shard_batch(jnp.asarray(order), mesh)
        bg_s = shard_batch(jnp.asarray(bg), mesh)
        got = jax.jit(run)(vs_r, masks_s, codes_s, order_s, bg_s)
        jax.block_until_ready(got)
    # population members are independent: sharding must not change samples
    np.testing.assert_array_equal(np.asarray(got), want)
    assert np.all(np.asarray(got)[:, :, :4] == 3)


def test_shard_batch_layout():
    mesh = make_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data", None)
    r = replicate({"w": np.ones(3)}, mesh)
    assert r["w"].sharding.spec == P()


def test_scene_view_with_mesh_sharded_population():
    """SceneGenerator with a mesh: the 8-candidate population shards over
    the data axis inside the compiled view step."""
    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.pipeline import CloudState, PixelSynth
    from pixelsynth_tpu.scene import SceneGenerator

    cfg = Config()
    W = 64
    cfg.model.W = W
    cfg.model.unet_num_filters = 4
    cfg.model.ngf = 8
    cfg.model.ndf = 8
    cfg.model.vqvae.channel = 16
    cfg.model.vqvae.n_res_channel = 8
    cfg.model.lmconv.nr_filters = 16
    cfg.model.lmconv.obs = (3, W // 8, W // 8)
    cfg.model.splat.max_points_per_tile = 1024
    cfg.model.splat.tile_group = 4
    ps = PixelSynth(cfg)
    vs = ps.init_variables(jax.random.PRNGKey(0))
    mesh = make_mesh()
    gen = SceneGenerator(ps, vs, num_samples=8, temperature=0.7,
                         cloud_capacity=W * W, mesh=mesh)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, W, W, 3)) * 2 - 1
    I = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    from pixelsynth_tpu.geometry.paths import get_rt_from_rot

    RTinv, RT = get_rt_from_rot("R", I, 2, 2)
    cams = {"K": I, "Kinv": I, "P_in": I, "Pinv_in": I, "P_out": RT}
    with mesh:
        best, out = gen.generate_view(
            img, cams, CloudState.empty(1, W * W, 3), None, I,
            jax.random.PRNGKey(2),
        )
    assert np.asarray(best).shape == (1, W, W, 3)
    assert np.isfinite(np.asarray(out["gen_imgs"])).all()
    assert out["gen_imgs"].shape[0] == 8
