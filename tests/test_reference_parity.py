"""Numeric parity: pixelsynth_tpu Flax modules vs the reference PyTorch
modules, through tools/import_reference_ckpt.py.

Each test instantiates the *actual* reference module from /root/reference
(randomly initialized, eval mode), converts its state_dict into our Flax
variables, and asserts the outputs agree on fixed inputs.  This proves both
the converter and the reimplementation's numerics; the same converter then
applies unchanged to the published trained checkpoints
(pixelsynth.pth / vqvae / autoregressive, demo.py:198-231).

Skipped wholesale when /root/reference or torch is unavailable.
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
def _ref_on_path():
    """Put the reference repo on sys.path with torchvision stubbed (only its
    VGG19 wrapper needs real torchvision, and we never construct it)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def t2n(t):
    return t.detach().cpu().numpy()


def nhwc(t):
    return t2n(t).transpose(0, 2, 3, 1)


def _opt(**kw):
    import argparse

    return argparse.Namespace(**kw)


def _warmup_spectral(module, make_input, n=20):
    """Converge torch spectral-norm u/v vectors so eval sigma is stable
    (our SNConv runs one power iteration from the stored u; after
    convergence both sides compute the same sigma)."""
    module.train()
    with torch.no_grad():
        for _ in range(n):
            module(make_input())
    module.eval()


# ---------------------------------------------------------------------------
# VQ-VAE
# ---------------------------------------------------------------------------


def test_vqvae_top_parity():
    from models.vqvae2.vqvae import VQVAETop as TorchVQ

    from pixelsynth_tpu.models.vqvae import VQVAETop
    from pixelsynth_tpu.tools.import_reference_ckpt import convert_vqvae

    torch.manual_seed(0)
    tm = TorchVQ(channel=32, n_res_channel=16)
    tm.eval()

    m = VQVAETop(channel=32, n_res_channel=16)
    x = np.random.RandomState(0).uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = convert_vqvae(tm.state_dict(), variables)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        dec_t, diff_t = tm(xt)
        qt, qb, _, id_t, id_b = tm.encode(xt)
        dcc_t = tm.decode_code(id_t)

    dec_j, diff_j = m.apply(variables, jnp.asarray(x), train=False)
    _, _, _, id_jt, id_jb = m.apply(variables, jnp.asarray(x), train=False,
                                    method=m.encode)
    dcc_j = m.apply(variables, id_jt, method=m.decode_code)

    np.testing.assert_array_equal(np.asarray(id_jt), t2n(id_t))
    np.testing.assert_array_equal(np.asarray(id_jb), t2n(id_b))
    np.testing.assert_allclose(np.asarray(dec_j), nhwc(dec_t), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dcc_j), nhwc(dcc_t), atol=2e-4)
    np.testing.assert_allclose(float(diff_j), float(diff_t.sum()), rtol=1e-4)


def test_vqvae_two_level_parity():
    from models.vqvae2.vqvae import VQVAE as TorchVQ

    from pixelsynth_tpu.models.vqvae import VQVAE
    from pixelsynth_tpu.tools.import_reference_ckpt import convert_vqvae

    torch.manual_seed(1)
    tm = TorchVQ(channel=32, n_res_channel=16)
    tm.eval()
    m = VQVAE(channel=32, n_res_channel=16)
    x = np.random.RandomState(1).uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = convert_vqvae(tm.state_dict(), variables, top_only=False)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        dec_t, _ = tm(xt)
    dec_j, _ = m.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(dec_j), nhwc(dec_t), atol=2e-4)


# ---------------------------------------------------------------------------
# lmconv PixelCNN
# ---------------------------------------------------------------------------


def test_lmconv_parity():
    from models.lmconv.model import OurPixelCNN

    from pixelsynth_tpu.models.lmconv import LMPixelCNN
    from pixelsynth_tpu.ops.orders import masks_for_orders_batch, raster_scan_order
    from pixelsynth_tpu.tools.import_reference_ckpt import convert_lmconv

    rows = cols = 8
    F, C = 16, 512
    torch.manual_seed(2)
    tm = OurPixelCNN(
        nr_resnet=2, nr_filters=F, input_channels=C, kernel_size=(3, 3),
        max_dilation=2, feature_norm_op=None, dropout_prob=0.0,
    )
    # PixelSynth config uses PONO (z_buffermodel.py:62-74)
    from models.lmconv.layers import PONO

    tm2 = OurPixelCNN(
        nr_resnet=2, nr_filters=F, input_channels=C, kernel_size=(3, 3),
        max_dilation=2, feature_norm_op=lambda nf: PONO(), dropout_prob=0.0,
    )
    for tmod, feature_norm in ((tm, "none"), (tm2, "pono")):
        tmod.eval()
        m = LMPixelCNN(nr_resnet=2, nr_filters=F, input_channels=C,
                       kernel_size=3, max_dilation=2,
                       feature_norm=feature_norm, dropout_prob=0.0)

        rng = np.random.RandomState(3)
        codes = rng.randint(0, C, (1, rows, cols))
        onehot = np.eye(C, dtype=np.float32)[codes]  # (1, H, W, C)
        order = raster_scan_order(rows, cols)
        a, b, d = masks_for_orders_batch([order], rows, cols, 3, 2)
        ja, jb, jd = (jnp.asarray(v, jnp.float32) for v in (a, b, d))

        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(onehot),
                           ja, jb, jd, train=False)
        variables = convert_lmconv(tmod.state_dict(), variables, nr_resnet=2)
        logits_j = m.apply(variables, jnp.asarray(onehot), ja, jb, jd,
                           train=False)

        xt = torch.from_numpy(onehot.transpose(0, 3, 1, 2))
        ta, tb, td = (torch.from_numpy(np.asarray(v, np.float32)) for v in (a, b, d))
        with torch.no_grad():
            logits_t = tmod([xt, ta, tb, td], sample=True)

        np.testing.assert_allclose(
            np.asarray(logits_j), nhwc(logits_t), atol=5e-4,
            err_msg=f"feature_norm={feature_norm}",
        )


# ---------------------------------------------------------------------------
# depth U-Net
# ---------------------------------------------------------------------------


def test_unet_parity():
    from models.networks.architectures import Unet as TorchUnet

    from pixelsynth_tpu.models.unet import UNet
    from pixelsynth_tpu.tools.import_reference_ckpt import convert_unet

    torch.manual_seed(4)
    opt = _opt(norm_G="sync:spectral_batch")
    tm = TorchUnet(num_filters=4, channels_in=3, channels_out=1, opt=opt)
    x = np.random.RandomState(4).uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    _warmup_spectral(tm, lambda: xt, n=60)

    m = UNet(num_filters=4, channels_out=1, spectral=True, levels=8)
    variables = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                       train=False)
    variables = convert_unet(tm.state_dict(), variables, levels=8)

    with torch.no_grad():
        out_t = tm(xt)
    out_j = m.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_j), nhwc(out_t),
                               atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# BigGAN ResNet encoder / decoder (noise-linear weights zeroed so the
# per-forward random noise cancels; the noise linears themselves are
# covered by test_noise_bn_parity)
# ---------------------------------------------------------------------------


def _zero_noise_linears(tm):
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if ("ch_a.0." in name or "ch_a.3." in name) and "weight" in name:
                p.zero_()


def test_resnet_encoder_parity():
    from models.networks.architectures import ResNetEncoder as TorchEnc

    from pixelsynth_tpu.models.encoderdecoder import ResNetEncoder, get_resnet_arch
    from pixelsynth_tpu.tools.import_reference_ckpt import convert_resnet_encoder

    torch.manual_seed(5)
    opt = _opt(norm_G="sync:batch", refine_model_type="resnet_256W8UpDown3",
               ngf=16)
    tm = TorchEnc(opt, channels_in=3, channels_out=64)
    _zero_noise_linears(tm)
    tm.eval()

    m = ResNetEncoder(model_type="resnet_256W8UpDown3", ngf=16, spectral=False)
    x = np.random.RandomState(5).uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "noise": jax.random.PRNGKey(1)},
                       jnp.asarray(x), train=False)
    arch = get_resnet_arch("resnet_256W8UpDown3", 16)
    variables = convert_resnet_encoder(tm.state_dict(), variables, arch)

    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = m.apply(variables, jnp.asarray(x), train=False,
                    rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(out_j), nhwc(out_t), atol=1e-4)


def test_resnet_decoder_parity():
    from models.networks.architectures import ResNetDecoder as TorchDec

    from pixelsynth_tpu.models.encoderdecoder import ResNetDecoder, get_resnet_arch
    from pixelsynth_tpu.tools.import_reference_ckpt import convert_resnet_decoder

    torch.manual_seed(6)
    opt = _opt(norm_G="sync:batch", refine_model_type="resnet_256W8UpDown3",
               ngf=16, predict_residual=False)
    cin = 4
    tm = TorchDec(opt, channels_in=cin, channels_out=3)
    _zero_noise_linears(tm)
    tm.eval()

    m = ResNetDecoder(model_type="resnet_256W8UpDown3", ngf=16, spectral=False,
                      predict_residual=False, use_tanh=True)
    x = np.random.RandomState(6).uniform(-1, 1, (1, 64, 64, cin)).astype(np.float32)
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "noise": jax.random.PRNGKey(1)},
                       jnp.asarray(x), None, train=False)
    arch = get_resnet_arch("resnet_256W8UpDown3", 16)
    variables = convert_resnet_decoder(tm.state_dict(), variables, arch,
                                       channels_in=cin)

    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = m.apply(variables, jnp.asarray(x), None, train=False,
                    rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(out_j), nhwc(out_t), atol=1e-4)


# ---------------------------------------------------------------------------
# noise-conditioned BN (deterministic noise injected on both sides)
# ---------------------------------------------------------------------------


def test_noise_bn_parity(monkeypatch):
    from models.layers.normalization import LinearNoiseLayer

    from pixelsynth_tpu.models.layers import NoiseBN
    from pixelsynth_tpu.tools.import_reference_ckpt import (
        _Put, _convert_noise_bn, _to_mutable,
    )

    torch.manual_seed(7)
    C = 24
    opt = _opt(norm_G="sync:spectral_batch")
    tm = LinearNoiseLayer(opt, noise_sz=20, output_sz=C)
    x = np.random.RandomState(7).uniform(-1, 1, (2, 8, 8, C)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    fixed_noise = np.random.RandomState(8).normal(size=(2, 20)).astype(np.float32)

    real_randn = torch.randn
    monkeypatch.setattr(torch, "randn", lambda *s, **k: real_randn(*s, **k))
    _warmup_spectral(tm, lambda: xt, n=20)
    monkeypatch.setattr(torch, "randn",
                        lambda *s, **k: torch.from_numpy(fixed_noise))

    m = NoiseBN(C, noise_sz=20, spectral=True)
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "noise": jax.random.PRNGKey(1)},
                       jnp.asarray(x), train=False)
    variables = _to_mutable(variables)
    put = _Put(variables)
    _convert_noise_bn(put, tm.state_dict(), "", "")

    with torch.no_grad():
        out_t = tm(xt)
    out_j = m.apply(variables, jnp.asarray(x), train=False,
                    noise=jnp.asarray(fixed_noise))
    np.testing.assert_allclose(np.asarray(out_j), nhwc(out_t),
                               atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------


def test_discriminator_parity():
    from models.networks.discriminators import MultiscaleDiscriminator as TorchD

    from pixelsynth_tpu.models.discriminators import MultiscaleDiscriminator
    from pixelsynth_tpu.tools.import_reference_ckpt import convert_discriminator

    torch.manual_seed(8)
    opt = _opt(norm_D="spectralinstance", ndf=16, output_nc=3,
               no_ganFeat_loss=False, isTrain=False)
    tm = TorchD(opt)
    x = np.random.RandomState(9).uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    _warmup_spectral(tm, lambda: xt, n=20)

    m = MultiscaleDiscriminator(ndf=16)
    variables = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                       train=False)
    variables = convert_discriminator(tm.state_dict(), variables)

    with torch.no_grad():
        outs_t = tm(xt)
    outs_j = m.apply(variables, jnp.asarray(x), train=False)
    assert len(outs_j) == len(outs_t) == 2
    for d in range(2):
        assert len(outs_j[d]) == len(outs_t[d])
        for f_j, f_t in zip(outs_j[d], outs_t[d]):
            np.testing.assert_allclose(np.asarray(f_j), nhwc(f_t),
                                       atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# BatchNorm_StandingStats
# ---------------------------------------------------------------------------


def test_standing_stats_bn_parity():
    from models.layers.normalization import BatchNorm_StandingStats

    from pixelsynth_tpu.models.layers import StandingStatsBN

    torch.manual_seed(9)
    C = 12
    tm = BatchNorm_StandingStats(C)
    rng = np.random.RandomState(10)
    m = StandingStatsBN(C)
    x0 = rng.normal(size=(2, 4, 4, C)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x0), train=False)
    params = {"params": {"gain": jnp.asarray(t2n(tm.gain)),
                         "bias": jnp.asarray(t2n(tm.bias))}}
    stats = variables["batch_stats"]

    # a few train steps (running-average mode), outputs + stats must track
    tm.train()
    for i in range(3):
        x = rng.normal(size=(2, 4, 4, C)).astype(np.float32) * (i + 1)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        out_t = tm(xt)
        out_j, upd = m.apply(
            {**params, "batch_stats": stats}, jnp.asarray(x), train=True,
            mutable=["batch_stats"],
        )
        stats = upd["batch_stats"]
        np.testing.assert_allclose(np.asarray(out_j), nhwc(out_t), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats["stored_mean"]), t2n(tm.bn.stored_mean), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats["stored_var"]), t2n(tm.bn.stored_var), atol=1e-5)

    # eval uses stored stats
    tm.eval()
    x = rng.normal(size=(2, 4, 4, C)).astype(np.float32)
    out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_j = m.apply({**params, "batch_stats": stats}, jnp.asarray(x),
                    train=False)
    np.testing.assert_allclose(np.asarray(out_j), nhwc(out_t), atol=1e-4)
