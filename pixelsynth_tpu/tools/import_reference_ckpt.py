"""Convert reference PyTorch checkpoints into pixelsynth_tpu Flax trees.

The reference stitches its inference model from three checkpoints plus the
Places365 classifier (demo.py:198-245):
  * ``pixelsynth.pth["state_dict"]``      -- BaseModel(DataParallel(ZbufferModelPts))
  * ``vqvae.pth``                         -- VQVAETop state_dict ("module."-prefixed)
  * ``autoregressive.pth["model_state_dict"]`` -- OurPixelCNN (lmconv)

This module maps each torch ``state_dict`` onto the corresponding Flax
variable collections, resolving torch's parameterizations at conversion
time:
  * weight_norm (``weight_g``/``weight_v``) -> effective dense weight,
  * spectral_norm (``weight_orig``/``weight_u``) -> raw weight + power-
    iteration vector copied into the "spectral_stats" collection (our SNConv
    runs the same one-step power iteration, models/layers.py:40-65),
  * Conv2d OIHW -> HWIO; ConvTranspose2d (I,O,kh,kw) -> flipped HWIO;
    Linear (O,I) -> (I,O),
  * BatchNorm running stats -> "batch_stats".

Every converter asserts leaf-shape agreement against a freshly initialized
Flax tree, so a structural mismatch fails loudly instead of silently
mis-assigning.

Numeric parity of every converter is asserted against the actual reference
modules (randomly initialized, eval mode) in tests/test_reference_parity.py.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


# ---------------------------------------------------------------------------
# tensor-level helpers
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    """Conv2d weight (O, I, kh, kw) -> HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def convT_kernel(w) -> np.ndarray:
    """ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose HWIO.

    flax.linen.ConvTranspose (transpose_kernel=False) runs an input-dilated
    *correlation*, whereas torch's transposed conv scatters -- equivalent to
    correlating with the spatially flipped kernel.
    """
    return _np(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def linear_kernel(w) -> np.ndarray:
    """Linear weight (O, I) -> Dense kernel (I, O)."""
    return _np(w).T.copy()


def resolve_weight_norm(sd: Mapping, prefix: str) -> np.ndarray:
    """Fold torch weight_norm: W = g * v / ||v|| (norm over dims != 0).

    Falls back to the plain ``weight`` when the layer was built without
    weight_norm -- PixelSynth instantiates OurPixelCNN with
    weight_norm=False (z_buffermodel.py:63-74), so its conv weights are
    stored plain while nin_out keeps weight_norm (model.py:99-108)."""
    if f"{prefix}.weight_g" not in sd:
        return _np(sd[f"{prefix}.weight"])
    g = _np(sd[f"{prefix}.weight_g"])
    v = _np(sd[f"{prefix}.weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v ** 2, axis=axes, keepdims=True))
    return g * v / norm


def lmconv_weight(w) -> np.ndarray:
    """locally_masked_conv2d weight (O, I, kh, kw) -> ours (k*k, I, O).

    Tap order is row-major (dy, dx) on both sides: torch flattens the
    unfold as (I, kh, kw) channel-major (locally_masked_convolution.py:39),
    we keep taps minor (ops/masked_conv.py:37-41).
    """
    w = _np(w)
    O, I, kh, kw = w.shape
    return w.transpose(2, 3, 1, 0).reshape(kh * kw, I, O)


class _Put:
    """Shape-checked leaf assignment into a nested Flax variables dict."""

    def __init__(self, tree: Dict):
        self.tree = tree
        self.assigned = []

    def __call__(self, path: str, value: np.ndarray):
        keys = path.split("/")
        node = self.tree
        for k in keys[:-1]:
            node = node[k]
        old = node[keys[-1]]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {path}: flax {tuple(old.shape)} "
                f"vs torch {tuple(value.shape)}"
            )
        node[keys[-1]] = np.asarray(value, dtype=np.asarray(old).dtype)
        self.assigned.append(path)


def _to_mutable(tree):
    if isinstance(tree, Mapping):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def strip_prefix(sd: Mapping, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------------


def _convert_plain_conv(put: _Put, sd: Mapping, tname: str, fpath: str):
    put(f"{fpath}/kernel", conv_kernel(sd[f"{tname}.weight"]))
    if f"{tname}.bias" in sd:
        put(f"{fpath}/bias", _np(sd[f"{tname}.bias"]))


def _convert_convT(put: _Put, sd: Mapping, tname: str, fpath: str):
    put(f"{fpath}/kernel", convT_kernel(sd[f"{tname}.weight"]))
    if f"{tname}.bias" in sd:
        put(f"{fpath}/bias", _np(sd[f"{tname}.bias"]))


def convert_vqvae(sd: Mapping, variables, *, top_only: bool = True,
                  n_res_block: int = 2) -> Dict:
    """VQVAETop / VQVAE state_dict (models/vqvae2/vqvae.py:164-312) ->
    {'params', 'ema'} matching pixelsynth_tpu.models.vqvae."""
    out = _to_mutable(variables)
    put = _Put(out)

    def encoder(tmod, fmod, stride):
        # blocks: stride4 = [C,R,C,R,C] + res; stride2 = [C,R,C] + res
        conv_idx = [0, 2, 4] if stride == 4 else [0, 2]
        for j, ci in enumerate(conv_idx):
            _convert_plain_conv(put, sd, f"{tmod}.blocks.{ci}", f"params/{fmod}/Conv_{j}")
        res0 = conv_idx[-1] + 1
        for r in range(n_res_block):
            base = f"{tmod}.blocks.{res0 + r}.conv"
            _convert_plain_conv(put, sd, f"{base}.1", f"params/{fmod}/ResBlock_{r}/Conv_0")
            _convert_plain_conv(put, sd, f"{base}.3", f"params/{fmod}/ResBlock_{r}/Conv_1")

    def decoder(tmod, fmod, stride):
        # blocks: [C] + res + [R] + (stride4: [T,R,T] | stride2: [T])
        _convert_plain_conv(put, sd, f"{tmod}.blocks.0", f"params/{fmod}/Conv_0")
        for r in range(n_res_block):
            base = f"{tmod}.blocks.{1 + r}.conv"
            _convert_plain_conv(put, sd, f"{base}.1", f"params/{fmod}/ResBlock_{r}/Conv_0")
            _convert_plain_conv(put, sd, f"{base}.3", f"params/{fmod}/ResBlock_{r}/Conv_1")
        t0 = 1 + n_res_block + 1
        if stride == 4:
            _convert_convT(put, sd, f"{tmod}.blocks.{t0}", f"params/{fmod}/ConvTranspose_0")
            _convert_convT(put, sd, f"{tmod}.blocks.{t0 + 2}", f"params/{fmod}/ConvTranspose_1")
        else:
            _convert_convT(put, sd, f"{tmod}.blocks.{t0}", f"params/{fmod}/ConvTranspose_0")

    def quantize(tmod, fmod):
        put(f"ema/{fmod}/embed", _np(sd[f"{tmod}.embed"]))
        put(f"ema/{fmod}/cluster_size", _np(sd[f"{tmod}.cluster_size"]))
        put(f"ema/{fmod}/embed_avg", _np(sd[f"{tmod}.embed_avg"]))

    encoder("enc_b", "enc_b", 4)
    encoder("enc_t", "enc_t", 2)
    _convert_plain_conv(put, sd, "quantize_conv_t", "params/quantize_conv_t")
    quantize("quantize_t", "quantize_t")
    decoder("dec_t", "dec_t", 2)
    _convert_plain_conv(put, sd, "quantize_conv_b", "params/quantize_conv_b")
    quantize("quantize_b", "quantize_b")
    _convert_convT(put, sd, "upsample_t", "params/upsample_t")
    decoder("dec", "dec", 4)
    return out


def _convert_wn_lmconv(put: _Put, sd: Mapping, tname: str, fpath: str):
    w = resolve_weight_norm(sd, tname)
    put(f"{fpath}/weight", lmconv_weight(w))
    if f"{tname}.bias" in sd:
        put(f"{fpath}/bias", _np(sd[f"{tname}.bias"]))
    if f"{tname}.mask_weight" in sd:
        mw = _np(sd[f"{tname}.mask_weight"])  # (O, k*k)
        put(f"{fpath}/mask_weight", mw.T.copy())


def _convert_wn_nin(put: _Put, sd: Mapping, tname: str, fpath: str):
    w = resolve_weight_norm(sd, f"{tname}.lin_a")
    put(f"{fpath}/Dense_0/kernel", linear_kernel(w))
    put(f"{fpath}/Dense_0/bias", _np(sd[f"{tname}.lin_a.bias"]))


def convert_lmconv(sd: Mapping, variables, *, nr_resnet: int = 2) -> Dict:
    """OurPixelCNN state_dict (models/lmconv/model.py:61-155) -> {'params'}
    for pixelsynth_tpu.models.lmconv.LMPixelCNN."""
    out = _to_mutable(variables)
    put = _Put(out)

    def gated(tmod, fmod, skip: bool):
        _convert_wn_lmconv(put, sd, f"{tmod}.conv_input", f"params/{fmod}/LMConv_0")
        _convert_wn_lmconv(put, sd, f"{tmod}.conv_out", f"params/{fmod}/LMConv_1")
        if skip:
            _convert_wn_nin(put, sd, f"{tmod}.nin_skip", f"params/{fmod}/Nin_0")

    _convert_wn_lmconv(put, sd, "u_init", "params/LMConv_0")

    g = 0
    # up pass: up_layers[0..2], downsize between 0-1 and 1-2
    for i in range(3):
        for j in range(nr_resnet):
            gated(f"up_layers.{i}.u_stream.{j}", f"GatedResnet_{g}", skip=False)
            g += 1
        if i < 2:
            _convert_wn_lmconv(put, sd, f"downsize_u_stream.{i}",
                               f"params/LMConv_{1 + i}")
    # down pass: down_layers[0..2] with [nr, nr+1, nr+1] blocks, upsize between
    down_nr = [nr_resnet, nr_resnet + 1, nr_resnet + 1]
    for i in range(3):
        for j in range(down_nr[i]):
            gated(f"down_layers.{i}.u_stream.{j}", f"GatedResnet_{g}", skip=True)
            g += 1
        if i < 2:
            _convert_wn_lmconv(put, sd, f"upsize_u_stream.{i}",
                               f"params/LMConv_{3 + i}")
    _convert_wn_nin(put, sd, "nin_out", "params/Nin_0")
    return out


def _conv_v_perm(v: np.ndarray, oihw_shape) -> np.ndarray:
    """torch spectral-norm v lives in the (I, kh, kw)-flattened input space;
    our SNConv flattens HWIO kernels as (kh, kw, I)."""
    O, I, kh, kw = oihw_shape
    return _np(v).reshape(I, kh, kw).transpose(1, 2, 0).reshape(-1).copy()


def _convert_sn_conv(put: _Put, sd: Mapping, tname: str, fpath: str,
                     spectral: bool = True):
    """spectral_norm Conv2d -> SNConv (kernel = weight_orig, u/v copied)."""
    if f"{tname}.weight_orig" in sd:
        w = sd[f"{tname}.weight_orig"]
        put(f"params/{fpath}/kernel", conv_kernel(w))
        put(f"spectral_stats/{fpath}/u", _np(sd[f"{tname}.weight_u"]))
        put(f"spectral_stats/{fpath}/v",
            _conv_v_perm(sd[f"{tname}.weight_v"], _np(w).shape))
    else:
        put(f"params/{fpath}/kernel", conv_kernel(sd[f"{tname}.weight"]))
    if f"{tname}.bias" in sd:
        put(f"params/{fpath}/bias", _np(sd[f"{tname}.bias"]))


def _convert_bn(put: _Put, sd: Mapping, tname: str, fpath: str):
    """torch BatchNorm2d -> flax BatchNorm (inside SyncBatchNorm wrapper)."""
    put(f"params/{fpath}/BatchNorm_0/scale", _np(sd[f"{tname}.weight"]))
    put(f"params/{fpath}/BatchNorm_0/bias", _np(sd[f"{tname}.bias"]))
    put(f"batch_stats/{fpath}/BatchNorm_0/mean", _np(sd[f"{tname}.running_mean"]))
    put(f"batch_stats/{fpath}/BatchNorm_0/var", _np(sd[f"{tname}.running_var"]))


def convert_unet(sd: Mapping, variables, *, levels: int = 8) -> Dict:
    """Reference Unet (architectures.py:174-279, spectral_norm convs +
    BatchNorm) -> pixelsynth_tpu.models.unet.UNet variables."""
    out = _to_mutable(variables)
    put = _Put(out)
    L = levels
    # encoder convs conv1..convL -> SNConv_0..L-1
    for i in range(L):
        _convert_sn_conv(put, sd, f"conv{i + 1}", f"SNConv_{i}")
    # decoder convs dconv1..dconvL -> SNConv_L..2L-1
    for i in range(L):
        _convert_sn_conv(put, sd, f"dconv{i + 1}", f"SNConv_{L + i}")
    # norms: encoder order bn2_0, bn4_0, bn8_0..8_{L-5};
    # decoder order bn8_{L-4}..bn8_{2L-9}, bn4_1, bn2_1, batch_norm
    enc_norms = ["batch_norm2_0", "batch_norm4_0"] + [
        f"batch_norm8_{i}" for i in range(L - 4)
    ]
    dec_norms = [f"batch_norm8_{L - 4 + i}" for i in range(L - 4)] + [
        "batch_norm4_1", "batch_norm2_1", "batch_norm"
    ]
    for j, t in enumerate(enc_norms + dec_norms):
        _convert_bn(put, sd, t, f"SyncBatchNorm_{j}")
    return out


def _j(*parts: str) -> str:
    return "/".join(p for p in parts if p)


def _t(*parts: str) -> str:
    return ".".join(p for p in parts if p)


def _convert_sn_linear(put: _Put, sd: Mapping, tname: str, fpath: str,
                       kernel_name: str, u_name: str):
    if _t(tname, "weight_orig") in sd:
        put(_j("params", fpath, kernel_name),
            linear_kernel(sd[_t(tname, "weight_orig")]))
        put(_j("spectral_stats", fpath, u_name), _np(sd[_t(tname, "weight_u")]))
        put(_j("spectral_stats", fpath, "v" + u_name[1:]),
            _np(sd[_t(tname, "weight_v")]))
    else:
        put(_j("params", fpath, kernel_name),
            linear_kernel(sd[_t(tname, "weight")]))


def _convert_noise_bn(put: _Put, sd: Mapping, tname: str, fpath: str):
    """LinearNoiseLayer (normalization.py:21-47) -> NoiseBN."""
    _convert_sn_linear(put, sd, _t(tname, "gain"), fpath, "gain_kernel", "u_gain")
    _convert_sn_linear(put, sd, _t(tname, "bias"), fpath, "bias_kernel", "u_bias")
    put(_j("batch_stats", fpath, "BatchNorm_0/mean"),
        _np(sd[_t(tname, "bn.stored_mean")]))
    put(_j("batch_stats", fpath, "BatchNorm_0/var"),
        _np(sd[_t(tname, "bn.stored_var")]))


def _convert_resnet_block(put: _Put, sd: Mapping, tmod: str, fmod: str,
                          has_shortcut: bool):
    """ResNet_Block (models/layers/blocks.py:33-73): ch_a = [bn_noise1, ReLU,
    conv_aa, bn_noise2, ReLU, conv_ab, resample]; ch_b = [conv_b, resample]."""
    _convert_noise_bn(put, sd, f"{tmod}.ch_a.0", f"{fmod}/NoiseBN_0")
    _convert_sn_conv(put, sd, f"{tmod}.ch_a.2", f"{fmod}/SNConv_0")
    _convert_noise_bn(put, sd, f"{tmod}.ch_a.3", f"{fmod}/NoiseBN_1")
    _convert_sn_conv(put, sd, f"{tmod}.ch_a.5", f"{fmod}/SNConv_1")
    if has_shortcut:
        _convert_sn_conv(put, sd, f"{tmod}.ch_b.0", f"{fmod}/SNConv_2")


def _resnet_blocks(put, sd, tprefix: str, chans, resamples):
    for l_id in range(1, len(chans)):
        has_short = bool(resamples[l_id - 1]) or (chans[l_id - 1] != chans[l_id])
        _convert_resnet_block(
            put, sd, f"{tprefix}.{l_id - 1}", f"ResNetBlock_{l_id - 1}", has_short
        )


def convert_resnet_encoder(sd: Mapping, variables, arch: Dict,
                           channels_in: int = 3) -> Dict:
    """ResNetEncoder (architectures.py:91-123): gblocks.<i>."""
    out = _to_mutable(variables)
    put = _Put(out)
    chans = list(arch["layers_enc"])
    chans[0] = channels_in
    _resnet_blocks(put, sd, "gblocks", chans, arch["downsample"])
    return out


def convert_resnet_decoder(sd: Mapping, variables, arch: Dict,
                           channels_in: int) -> Dict:
    """ResNetDecoder (architectures.py:126-167): eblocks.<i>."""
    out = _to_mutable(variables)
    put = _Put(out)
    chans = list(arch["layers_dec"])
    if chans[0] is None:
        chans[0] = channels_in
    _resnet_blocks(put, sd, "eblocks", chans, arch["upsample"])
    return out


def convert_discriminator(sd: Mapping, variables, *, num_D: int = 2,
                          n_layers: int = 4) -> Dict:
    """MultiscaleDiscriminator (discriminators.py:78-215):
    discriminator_<i>.model<n>.0 convs; middle layers spectral, no bias."""
    out = _to_mutable(variables)
    put = _Put(out)
    for d in range(num_D):
        fmod = f"NLayerDiscriminator_{d}"
        for n in range(n_layers + 1):
            # middle layers sit inside the norm_layer Sequential
            # (spectral conv at .0, InstanceNorm at .1) -> extra ".0"
            mid = 1 <= n <= n_layers - 1
            t = f"discriminator_{d}.model{n}.0" + (".0" if mid else "")
            _convert_sn_conv(put, sd, t, f"{fmod}/SNConv_{n}")
    return out


# ---------------------------------------------------------------------------
# top-level stitching (demo.py:198-245)
# ---------------------------------------------------------------------------


def _normalize_zbuffer_sd(sd: Mapping) -> Dict:
    """Strip the BaseModel/DataParallel wrappers: keys arrive as
    ``model.module.<submodule>...`` (demo.py:203-210)."""
    out = {}
    for k, v in sd.items():
        for pre in ("model.module.", "module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        out[k] = v
    return out


def import_pixelsynth(state_dict: Mapping, pipeline, variables) -> Dict:
    """Map pixelsynth.pth['state_dict'] onto a PixelSynth variables dict.

    Converts every submodule present in the state_dict: pts_regressor ->
    'unet', encoder -> 'encoder', projector -> 'projector', vqvae, outpaint2
    -> 'pixelcnn', netD -> 'disc' (z_buffermodel.py module attributes).
    Entries absent from the checkpoint keep their initialized values.
    """
    from pixelsynth_tpu.models.encoderdecoder import get_resnet_arch

    sd = _normalize_zbuffer_sd(state_dict)
    mc = pipeline.cfg.model
    variables = _to_mutable(variables)

    sub = strip_prefix(sd, "pts_regressor.")
    if sub:
        variables["unet"] = convert_unet(
            sub, variables["unet"], levels=int(np.log2(mc.W)))
    sub = strip_prefix(sd, "encoder.")
    if sub and "encoder" in variables:
        arch = get_resnet_arch(mc.refine_model_type, mc.ngf)
        variables["encoder"] = convert_resnet_encoder(
            sub, variables["encoder"], arch)
    sub = strip_prefix(sd, "projector.")
    if sub:
        arch = get_resnet_arch(mc.refine_model_type, mc.ngf)
        cin = 3 if mc.use_rgb_features else 64
        variables["projector"] = convert_resnet_decoder(
            sub, variables["projector"], arch, channels_in=cin + 1)
    sub = strip_prefix(sd, "vqvae.")
    if sub:
        variables["vqvae"] = convert_vqvae(sub, variables["vqvae"])
    sub = strip_prefix(sd, "outpaint2.")
    if sub:
        variables["pixelcnn"] = convert_lmconv(
            sub, variables["pixelcnn"], nr_resnet=mc.lmconv.nr_resnet)
    sub = strip_prefix(sd, "netD.")
    if sub and "disc" in variables:
        variables["disc"] = convert_discriminator(sub, variables["disc"])
    return variables


def import_from_files(pipeline, variables, *, pixelsynth_path=None,
                      vqvae_path=None, autoregressive_path=None) -> Dict:
    """Load + stitch the three reference checkpoint files (demo.py:198-231).

    Requires torch only for deserialization."""
    import torch

    if pixelsynth_path:
        ckpt = torch.load(pixelsynth_path, map_location="cpu")
        sd = ckpt.get("state_dict", ckpt)
        variables = import_pixelsynth(sd, pipeline, variables)
    if vqvae_path:
        sd = torch.load(vqvae_path, map_location="cpu")
        sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
        variables = _to_mutable(variables)
        variables["vqvae"] = convert_vqvae(sd, variables["vqvae"])
    if autoregressive_path:
        ckpt = torch.load(autoregressive_path, map_location="cpu")
        sd = ckpt.get("model_state_dict", ckpt)
        variables = _to_mutable(variables)
        variables["pixelcnn"] = convert_lmconv(
            sd, variables["pixelcnn"],
            nr_resnet=pipeline.cfg.model.lmconv.nr_resnet)
    return variables
