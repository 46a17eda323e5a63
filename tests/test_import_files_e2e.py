"""End-to-end reference checkpoint ingestion: the three-file layout the
published checkpoints ship in (demo.py:198-231), through
tools/import_reference_ckpt.import_from_files.

Builds the reference's FULL ZbufferModelPts (random init -- torch + the
reference code are in-env), saves pixelsynth.pth / vqvae.pth /
autoregressive.pth exactly as the reference writes them (BaseModel
``model.module.`` prefixes, DataParallel ``module.`` prefix on the VQ,
``model_state_dict`` wrapper on the AR prior), ingests the files, and
asserts forward agreement module-by-module against the torch model.

Complements tests/test_reference_parity.py (per-module converters): this
covers the whole-file path -- torch.load, prefix stripping,
_normalize_zbuffer_sd, submodule dispatch -- that had never executed.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")), reason="reference repo absent"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _ref_env():
    """Reference repo on sys.path with its unavailable native/hub deps
    stubbed: pytorch3d (CUDA rasterizer -- never called at construction),
    torchvision (classifier/VGG hub downloads), mock."""
    stubs = {}

    def stub(name, mod):
        if name not in sys.modules:
            sys.modules[name] = mod
            stubs[name] = mod

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")

    def _tiny_classifier(num_classes=365):
        return torch.nn.Linear(8, num_classes)

    tvm.__dict__["resnet18"] = _tiny_classifier
    tvt = types.ModuleType("torchvision.transforms")
    for n in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
        setattr(tvt, n, lambda *a, **k: (lambda x: x))
    tv.models = tvm
    tv.transforms = tvt
    stub("torchvision", tv)
    stub("torchvision.models", tvm)
    stub("torchvision.transforms", tvt)

    p3d = types.ModuleType("pytorch3d")
    p3s = types.ModuleType("pytorch3d.structures")
    p3s.Pointclouds = object
    p3r = types.ModuleType("pytorch3d.renderer")
    p3r.compositing = types.SimpleNamespace()
    p3rp = types.ModuleType("pytorch3d.renderer.points")
    p3rp.rasterize_points = lambda *a, **k: None
    stub("pytorch3d", p3d)
    stub("pytorch3d.structures", p3s)
    stub("pytorch3d.renderer", p3r)
    stub("pytorch3d.renderer.points", p3rp)

    import unittest.mock

    stub("mock", unittest.mock)

    # the compiled Cython order extension isn't built here; construction
    # never calls it
    gco = types.ModuleType("models.lmconv.get_custom_order")
    gco.custom_idx = lambda *a, **k: None
    stub("models.lmconv.get_custom_order", gco)

    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)
    for name in stubs:
        del sys.modules[name]


def _ref_opts(W=256, ngf=32):
    import argparse

    return argparse.Namespace(
        W=W,
        ngf=ngf,
        norm_G="sync:spectral_batch",
        refine_model_type="resnet_256W8UpDown3",
        depth_predictor_type="unet",
        use_rgb_features=True,
        Unet_num_filters=32,
        use_inverse_depth=False,
        losses=["1.0_l1"],  # no "content": keeps torchvision VGG out
        min_z=0.5,
        max_z=10.0,
        voxel_size=64,
        seed=0,
        splatter="xyblending",
        learn_default_feature=True,
        radius=4,
        rad_pow=2,
        num_views=2,
        pp_pixel=128,
        tau=1.0,
        accumulation="alphacomposite",
        down_sample=True,
        out_channels=3,
        discretized=False,
        no_outpainting=False,
        normalize_image=True,
    )


@pytest.fixture(scope="module")
def torch_model(_ref_env):
    torch.manual_seed(0)
    from models.z_buffermodel import ZbufferModelPts

    model = ZbufferModelPts(_ref_opts())
    model.eval()
    # converge spectral-norm u/v so eval sigmas are stable on both sides
    model.train()
    with torch.no_grad():
        for _ in range(12):
            model.pts_regressor(torch.randn(2, 3, 256, 256))
            model.projector(torch.randn(2, 4, 256, 256))
    model.eval()
    return model


@pytest.fixture(scope="module")
def ckpt_files(tmp_path_factory, torch_model):
    """The reference's on-disk layout (demo.py:198-231)."""
    d = tmp_path_factory.mktemp("ref_ckpts")
    sd = {f"model.module.{k}": v for k, v in torch_model.state_dict().items()}
    torch.save({"state_dict": sd, "opts": None}, d / "pixelsynth.pth")

    # vqvae.pth: DataParallel state dict ("module." prefix); resample the
    # weights so the test catches a converter that silently keeps the
    # pixelsynth.pth copy instead of the dedicated file
    torch.manual_seed(1)
    from models.vqvae2.vqvae import VQVAETop

    vq2 = VQVAETop()
    torch.save({f"module.{k}": v for k, v in vq2.state_dict().items()},
               d / "vqvae.pth")

    torch.manual_seed(2)
    from models.lmconv.layers import PONO
    from models.lmconv.model import OurPixelCNN

    ar2 = OurPixelCNN(
        nr_resnet=2, nr_filters=80, input_channels=512, nr_logistic_mix=10,
        kernel_size=(3, 3), max_dilation=2, weight_norm=False,
        feature_norm_op=lambda c: PONO(), dropout_prob=0, conv_bias=True,
        conv_mask_weight=False, rematerialize=False, binarize=False,
    )
    torch.save({"model_state_dict": ar2.state_dict()}, d / "autoregressive.pth")
    return {"dir": d, "vq2": vq2, "ar2": ar2}


def test_import_from_files_forward_agreement(torch_model, ckpt_files):
    from pixelsynth_tpu.config import Config
    from pixelsynth_tpu.pipeline import PixelSynth
    from pixelsynth_tpu.tools.import_reference_ckpt import import_from_files

    cfg = Config()
    cfg.model.W = 256
    cfg.model.ngf = 32
    ps = PixelSynth(cfg)
    variables = ps.init_variables(jax.random.PRNGKey(0), with_disc=False)
    init_proj = jax.tree_util.tree_leaves(variables["projector"])[0]

    d = ckpt_files["dir"]
    variables = import_from_files(
        ps, variables,
        pixelsynth_path=str(d / "pixelsynth.pth"),
        vqvae_path=str(d / "vqvae.pth"),
        autoregressive_path=str(d / "autoregressive.pth"),
    )

    # --- depth U-Net: raw logits agree with torch pts_regressor ---
    rng = np.random.default_rng(3)
    img = rng.standard_normal((2, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.pts_regressor(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    ours = ps.unet.apply(variables["unet"], jnp.asarray(img), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    # --- VQ-VAE: code ids match the *dedicated* vqvae.pth weights ---
    img01 = rng.random((2, 256, 256, 3)).astype(np.float32) * 2 - 1
    with torch.no_grad():
        _, _, _, ref_ids, _ = ckpt_files["vq2"].encode(
            torch.from_numpy(img01.transpose(0, 3, 1, 2)))
    our_ids = ps.vqvae.apply(variables["vqvae"], jnp.asarray(img01),
                             train=False, method=ps.vqvae.encode)[3]
    assert (np.asarray(our_ids) == ref_ids.numpy()).mean() > 0.999

    # --- AR prior: logits match the autoregressive.pth weights ---
    codes = rng.integers(0, 512, (1, 32, 32))
    oh = np.eye(512, dtype=np.float32)[codes]
    masks = np.ones((1, 9, 1024), np.float32)
    with torch.no_grad():
        t_in = torch.from_numpy(oh.transpose(0, 3, 1, 2))
        tm = torch.from_numpy(masks)
        ref_logits = ckpt_files["ar2"](
            [t_in, tm, tm, tm], sample=True
        ).numpy().transpose(0, 2, 3, 1)
    our_logits = ps.pixelcnn.apply(
        variables["pixelcnn"], jnp.asarray(oh), jnp.asarray(masks),
        jnp.asarray(masks), jnp.asarray(masks), train=False)
    np.testing.assert_allclose(np.asarray(our_logits), ref_logits,
                               atol=5e-3, rtol=1e-3)

    # --- projector tree actually ingested (parity proven per-module in
    # test_reference_parity.py) ---
    new_proj = jax.tree_util.tree_leaves(variables["projector"])[0]
    assert not np.allclose(np.asarray(init_proj), np.asarray(new_proj))
