"""The PixelSynth pipeline, TPU-native.

Functional re-design of the reference's ZbufferModelPts orchestrator
(models/z_buffermodel.py:29-754).  The neural pieces live in separate Flax
variable trees (matching the reference's independently trained stages:
depth+refinement / VQ-VAE / PixelCNN / discriminator), and the pipeline
stages are pure jitted functions:

  depth U-Net -> fused reprojection -> soft z-buffer splat -> background
  mask -> (host callback: greedy generation order + kernel masks) ->
  VQ-code autoregressive loss / sampling -> refinement decode.

Cumulative scenes carry a fixed-capacity, validity-masked point-cloud
buffer (`CloudState`) instead of the reference's unbounded torch.cat
(z_buffer_manipulator.py:244-248): appends compact the buffer with a
stable sort so capacity is used densely.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pixelsynth_tpu.config import Config
from pixelsynth_tpu.geometry.projection import (
    homogeneous_to_pixels,
    lift_to_cloud,
    _to44,
)
from pixelsynth_tpu.models.discriminators import MultiscaleDiscriminator
from pixelsynth_tpu.models.encoderdecoder import ResNetDecoder, ResNetEncoder
from pixelsynth_tpu.models.lmconv import LMPixelCNN
from pixelsynth_tpu.models.losses import VGG19Features, synthesis_loss
from pixelsynth_tpu.models.unet import UNet
from pixelsynth_tpu.models.vqvae import VQVAETop
from pixelsynth_tpu.ops.distance_transform import signed_distance_field
from pixelsynth_tpu.ops.orders import custom_order, masks_for_orders_batch
from pixelsynth_tpu.ops.orders_jax import orders_and_masks_jax
from pixelsynth_tpu.ops.splat import splat


def _softmax_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy over all positions (torch CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


# ---------------------------------------------------------------------------
# cumulative point-cloud state
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CloudState:
    """Fixed-capacity homogeneous point cloud carried across scene views.

    pts: (B, C_max, 4) in the K-projected frame of the last rendered view
    (the reference's xy_proj, z_buffer_manipulator.py:242-248);
    feats: (B, C_max, F); valid: (B, C_max) bool.
    """

    pts: jnp.ndarray
    feats: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(B: int, capacity: int, feat_dim: int) -> "CloudState":
        return CloudState(
            pts=jnp.zeros((B, capacity, 4)),
            feats=jnp.zeros((B, capacity, feat_dim)),
            valid=jnp.zeros((B, capacity), bool),
        )

    def transform(self, K, RT_cam2, RTinv_cam3) -> "CloudState":
        """Re-express the cloud in a new camera frame:
        pts' = K @ RT2 @ RTinv3 @ pts (matches
        z_buffer_manipulator.py:244-247, K folded per reference).

        NOTE: exact only for model-facing K == identity -- which every
        dataset in this framework guarantees (demo/habitat/RealEstate all
        fold OFFSET @ K into P; data/realestate10k.py:33-41,
        data/demo_data.py).  For a non-identity K this would need a
        trailing @ Kinv, a quirk inherited from the reference's
        project_pts_cumulative."""
        M = _to44(K) @ (_to44(RT_cam2) @ _to44(RTinv_cam3))
        pts = jnp.einsum("bij,bnj->bni", M, self.pts)
        return CloudState(pts, self.feats, self.valid)

    def append_compact(self, new_pts, new_feats, new_valid) -> "CloudState":
        """Append candidates then stable-compact valid entries to the front.

        Capacity overflow drops the *newest tail* entries (the oldest scene
        content is what keeps a walk consistent).
        """
        pts = jnp.concatenate([self.pts, new_pts], axis=1)
        feats = jnp.concatenate([self.feats, new_feats], axis=1)
        valid = jnp.concatenate([self.valid, new_valid], axis=1)
        cap = self.pts.shape[1]

        def per_image(p, f, v):
            order = jnp.argsort(~v, stable=True)
            return p[order][:cap], f[order][:cap], v[order][:cap]

        p, f, v = jax.vmap(per_image)(pts, feats, valid)
        return CloudState(p, f, v)


# ---------------------------------------------------------------------------
# host callback: generation orders + kernel masks
# ---------------------------------------------------------------------------


def _orders_and_masks_host(distances: np.ndarray, k: int, max_dilation: int):
    """distances (B, 32, 32) int32 -> (order (B,1024,2) i32, masks (B,3,9,1024) f32)."""
    distances = np.asarray(distances)
    B, H, W = distances.shape
    order = custom_order(distances)
    a, b, d = masks_for_orders_batch(list(order), H, W, k, max_dilation)
    masks = np.stack([a, b, d], axis=1).astype(np.float32)
    return order.astype(np.int32), masks


def orders_and_masks(distances: jnp.ndarray, k: int = 3, max_dilation: int = 2):
    """jit-safe wrapper: the greedy heap order is inherently sequential, so
    it runs on the host (C++), exactly like the reference's Cython call
    (z_buffermodel.py:690-699) -- but batched, in one callback."""
    B, H, W = distances.shape
    out_shapes = (
        jax.ShapeDtypeStruct((B, H * W, 2), jnp.int32),
        jax.ShapeDtypeStruct((B, 3, k * k, H * W), jnp.float32),
    )
    return jax.pure_callback(
        functools.partial(_orders_and_masks_host, k=k, max_dilation=max_dilation),
        out_shapes,
        distances,
        vmap_method="sequential",
    )


# ---------------------------------------------------------------------------
# mask downsampling (reference AvgPool2d(8) + uint8 truncation semantics)
# ---------------------------------------------------------------------------


def downsample_mask(mask: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """(B, H, W) float avg-pool by `factor` (z_buffermodel.py:87,646-647)."""
    m = mask.astype(jnp.float32)[..., None]
    out = nn.avg_pool(m, (factor, factor), strides=(factor, factor))
    return out[..., 0]


def binarize_trunc(mask_ds: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] -> {0,1} by truncation (the reference's astype(np.uint8),
    z_buffermodel.py:668-669): 1 only where the cell is entirely inside."""
    return (mask_ds >= 1.0 - 1e-6).astype(jnp.float32)


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------


class PixelSynth:
    """Builds the module set from a Config and exposes the pipeline stages.

    Variables layout (one tree per independently-trained stage):
      {"unet": ..., "projector": ..., "vqvae": ..., "pixelcnn": ...,
       "disc": ..., "vgg": ...}
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        mc = cfg.model
        spectral = "spectral" in mc.norm_G
        self.spectral = spectral
        levels = int(round(np.log2(mc.W)))
        assert 2 ** levels == mc.W, "W must be a power of two"
        bn_kind = "batchstanding" if "batchstanding" in mc.norm_G else "batch"
        self.unet = UNet(num_filters=mc.unet_num_filters, channels_out=1,
                         spectral=spectral, levels=levels, norm=bn_kind)
        self.encoder = (
            None if mc.use_rgb_features
            else ResNetEncoder(mc.refine_model_type, mc.ngf, spectral)
        )
        # post-splat feature modifier U-Net (z_buffermodel.py:45-46,334-335)
        self.modifier = (
            UNet(num_filters=mc.unet_num_filters, channels_out=64,
                 spectral=spectral, levels=levels, norm=bn_kind)
            if "modifier" in mc.depth_predictor_type else None
        )
        self.projector = ResNetDecoder(
            mc.refine_model_type, mc.ngf, spectral,
            predict_residual=mc.predict_residual,
            normalize_before_residual=mc.normalize_before_residual,
            use_tanh=True,
        )
        v = mc.vqvae
        self.vqvae = VQVAETop(
            in_channel=v.in_channel, channel=v.channel,
            n_res_block=v.n_res_block, n_res_channel=v.n_res_channel,
            embed_dim=v.embed_dim, n_embed=v.n_embed, decay=v.decay,
        )
        l = mc.lmconv
        pcnn_args = dict(
            nr_resnet=l.nr_resnet, nr_filters=l.nr_filters,
            input_channels=l.input_channels, kernel_size=l.kernel_size,
            max_dilation=l.max_dilation, feature_norm=l.feature_norm,
            dropout_prob=l.dropout_prob, conv_bias=l.conv_bias,
            conv_mask_weight=l.conv_mask_weight, num_classes=l.num_classes,
        )
        # differentiable instance (training) + fast-backend instance
        # (sampling) sharing one parameter tree
        self.pixelcnn = LMPixelCNN(
            **pcnn_args,
            compute_dtype=l.compute_dtype if l.train_backend == "pallas" else None,
            backend=l.train_backend,
        )
        self.pixelcnn_fast = LMPixelCNN(
            **pcnn_args, compute_dtype=l.compute_dtype,
            # "fused" routes sampling through ops/lmconv_fused (see
            # make_sampling_logits_fn); the module fast path stays pallas
            backend="pallas" if l.sample_backend == "fused" else l.sample_backend,
        )
        self.disc = MultiscaleDiscriminator(ndf=mc.ndf)
        self.vgg = VGG19Features()
        self.W = mc.W
        self.obs = l.obs  # (C, rows, cols) of the code grid

    # -- initialization ----------------------------------------------------

    def init_variables(self, key: jax.Array, with_disc: bool = True,
                       on_cpu: bool = True) -> Dict:
        """Initialize all variable trees.

        Initialization is pure RNG + shape inference, so it runs on the CPU
        backend by default -- compiling six full-size init graphs on an
        accelerator (particularly through a remote-compile tunnel) costs
        minutes for no benefit; arrays move to device lazily on first use.
        """
        if on_cpu:
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    return self.init_variables(key, with_disc, on_cpu=False)
        W = self.W
        img = jnp.zeros((1, W, W, 3))
        k_unet, k_proj, k_vq, k_pcnn, k_disc, k_vgg, k_noise = jax.random.split(key, 7)
        rows, cols = self.obs[1], self.obs[2]
        nc = self.cfg.model.lmconv.num_classes
        oh = jnp.zeros((1, rows, cols, nc))
        m = jnp.ones((1, self.cfg.model.lmconv.kernel_size ** 2, rows * cols))
        variables = {
            "unet": self.unet.init({"params": k_unet}, img, train=False),
            "projector": self.projector.init(
                {"params": k_proj, "noise": k_noise}, img,
                jnp.zeros((1, W, W), bool), train=False,
            ),
            "vqvae": self.vqvae.init({"params": k_vq}, img, train=False),
            "pixelcnn": self.pixelcnn.init(
                {"params": k_pcnn}, oh, m, m, m, train=False
            ),
            "vgg": self.vgg.init({"params": k_vgg}, img),
        }
        if self.encoder is not None:
            variables["encoder"] = self.encoder.init(
                {"params": k_proj, "noise": k_noise}, img, train=False
            )
        if with_disc:
            variables["disc"] = self.disc.init({"params": k_disc}, img, train=False)
        return variables

    # -- stages ------------------------------------------------------------

    def regress_depth(self, unet_vars, img, *, train=False, rngs=None):
        """sigmoid(UNet) scaled to [min_z, max_z] (z_buffermodel.py:303-314);
        optional inverse-depth parameterization for long-tail scenes."""
        mc = self.cfg.model
        mutable = ["batch_stats", "spectral_stats"] if train else False
        out = self.unet.apply(unet_vars, img, train=train, rngs=rngs, mutable=mutable)
        raw, upd = out if train else (out, None)
        raw = raw[..., 0]  # (B, H, W)
        if mc.use_inverse_depth:
            depth = 1.0 / (jax.nn.sigmoid(raw) * 10.0 + 0.01)
        else:
            depth = jax.nn.sigmoid(raw) * (mc.max_z - mc.min_z) + mc.min_z
        return depth, upd

    def features(self, variables, img, *, train=False, rngs=None,
                 noise_scale: float = 1.0):
        if self.encoder is None:
            return img, None
        mutable = ["batch_stats", "spectral_stats"] if train else False
        out = self.encoder.apply(
            variables["encoder"], img, train=train, rngs=rngs, mutable=mutable,
            noise_scale=noise_scale,
        )
        return out if train else (out, None)

    def splat_view(self, fs, depth, cams, *, valid_extra=None):
        """Project view-1 features into the output camera and splat.

        cams: dict with K, Kinv, P_in, Pinv_in, P_out (each (B,4,4)).
        Returns (gen_fs (B,W,W,C), background (B,W,W) bool, cloud (B,N,4)).
        """
        B = fs.shape[0]
        cloud = lift_to_cloud(
            depth, cams["K"], cams["Kinv"], cams["Pinv_in"], cams["P_out"], self.W
        )
        pts, valid = homogeneous_to_pixels(cloud, self.W)
        feats = fs.reshape(B, -1, fs.shape[-1])
        if valid_extra is not None:
            valid = valid & valid_extra
        gen_fs, bg = splat(pts, feats, valid, W=self.W, cfg=self.cfg.model.splat)
        return gen_fs, bg, jnp.swapaxes(cloud, 1, 2)  # cloud as (B, N, 4)

    def splat_cumulative(self, fs, depth, cams, state: CloudState,
                         last_bg: Optional[jnp.ndarray], RTinv_last):
        """Cumulative-scene splat (z_buffer_manipulator.py:184-266): carry
        prior cloud into the new camera, and splat it together with ONLY the
        *previously outpainted* (last-background) points of the current view
        -- the reference filters both the rendered points and the appended
        cloud by last_background_mask (z_buffer_manipulator.py:190-207:
        ``pred_pts = pred_pts[last_background_mask==True]`` before
        project_pts_cumulative, whose xy_proj concat is both the sampler and
        the returned new_point_cloud).

        That filter is load-bearing for walk stability: the carried image is
        a decoder output whose re-encoded features and re-regressed depth
        are degraded copies of content the cloud already holds at its
        original quality; splatting the full current view makes those
        duplicates z-fight the trusted points and every rendered view decays
        toward reconstruction mush (measured: scene_gt_psnr stuck at ~10.4
        at every walk depth, evidence/scene_drift_r5.json pre-fix)."""
        B = fs.shape[0]
        cur_cloud = lift_to_cloud(
            depth, cams["K"], cams["Kinv"], cams["Pinv_in"], cams["P_out"], self.W
        )
        cur_pts, cur_valid = homogeneous_to_pixels(cur_cloud, self.W)
        cur_feats = fs.reshape(B, -1, fs.shape[-1])
        # only the carried image's newly-generated region contributes points
        # (to the render AND the cloud); everything else renders from the
        # carried cloud's original features
        if last_bg is not None:
            cur_valid = cur_valid & last_bg.reshape(B, -1)

        # prior cloud re-expressed in the current output frame
        state_t = state.transform(cams["K"], cams["P_out"], RTinv_last)
        prior_pts, prior_valid = homogeneous_to_pixels(
            jnp.swapaxes(state_t.pts, 1, 2), self.W
        )
        prior_valid = prior_valid & state_t.valid

        pts = jnp.concatenate([cur_pts, prior_pts], axis=1)
        feats = jnp.concatenate([cur_feats, state_t.feats], axis=1)
        valid = jnp.concatenate([cur_valid, prior_valid], axis=1)
        gen_fs, bg = splat(pts, feats, valid, W=self.W, cfg=self.cfg.model.splat)

        # grow the cloud with the same filtered points
        new_state = state_t.append_compact(
            jnp.swapaxes(cur_cloud, 1, 2), cur_feats, cur_valid
        )
        return gen_fs, bg, new_state

    def masks_for_background(self, bg_mask, *, host: Optional[bool] = None):
        """Full get_masks_for_batch (z_buffermodel.py:641-701), entirely on
        device: exact distance transform, greedy generation order as a
        masked-argmax loop (ops/orders_jax.py), and shift-comparison kernel
        masks.  `host=True` routes the order through the C++ host library
        instead (pure_callback; useful off-mesh).

        Returns (order (B,1024,2), masks (B,3,k^2,1024), bg_ds (B,32,32))."""
        fg_ds = downsample_mask(~bg_mask)
        bg_ds = downsample_mask(bg_mask)
        l = self.cfg.model.lmconv
        if host is None:
            host = l.masks_backend == "host"
        distances = signed_distance_field(
            binarize_trunc(fg_ds), binarize_trunc(bg_ds), mode=l.dt_mode)
        if host:
            order, masks = orders_and_masks(distances, l.kernel_size, l.max_dilation)
        else:
            order, masks = orders_and_masks_jax(
                distances, l.kernel_size, l.max_dilation
            )
        return order, masks, bg_ds

    def vq_encode(self, vq_vars, img):
        """Frozen-codebook encode -> (B, 32, 32) int codes (vqvae.py:280-297)."""
        _, _, diff, id_t, _ = self.vqvae.apply(
            vq_vars, img, train=False, method=self.vqvae.encode
        )
        return id_t, diff

    def vq_decode(self, vq_vars, codes):
        return self.vqvae.apply(vq_vars, codes, method=self.vqvae.decode_code)

    def pixelcnn_logits(self, pcnn_vars, onehot, masks, *, train=False, rngs=None):
        """masks: (B, 3, k^2, HW) stacked [init, undilated, dilated]."""
        return self.pixelcnn.apply(
            pcnn_vars, onehot, masks[:, 0], masks[:, 1], masks[:, 2],
            train=train, rngs=rngs,
        )

    def pixelcnn_logits_codes(self, pcnn_vars, codes, filled, masks, *,
                              train=False, rngs=None):
        """Sampling fast path: integer codes + filled mask in place of the
        one-hot tensor, embedding-gather first layer, and the Pallas
        masked-conv backend (same parameters, same logits)."""
        return self.pixelcnn_fast.apply(
            pcnn_vars, None, masks[:, 0], masks[:, 1], masks[:, 2],
            codes=codes, filled=filled, train=train, rngs=rngs,
        )

    def make_sampling_logits_fn(self, pcnn_vars, masks):
        """(codes, filled) -> logits closure for the AR population loop.

        sample_backend "fused" uses the two-launch whole-network kernels
        (ops/lmconv_fused.py -- weights packed and masks transposed ONCE,
        outside the loop body); anything else goes through the per-layer
        module path."""
        l = self.cfg.model.lmconv
        if l.sample_backend == "fused":
            from pixelsynth_tpu.ops.lmconv_fused import (
                make_fused_logits_fn,
                pack_lmconv_params,
            )

            # memoize the packed weights per variables tree for EAGER
            # callers (bench, eval harnesses): each call otherwise pays
            # ~0.5 s of eager dispatch on a remote-tunneled chip.  Inside
            # a trace (the jitted view step) the packing is inlined into
            # the executable -- never cache tracers there.  Cacheability
            # is decided on the PACKED OUTPUT: even with concrete
            # variables, packing performed under an enclosing trace
            # (e.g. variables closed over, masks traced) yields tracers,
            # which must not outlive the trace.
            cache = getattr(self, "_fused_pack_cache", None)
            if cache is not None and cache[0] is pcnn_vars:
                packed = cache[1]
            else:
                packed = pack_lmconv_params(
                    pcnn_vars["params"], nr_resnet=l.nr_resnet,
                    compute_dtype=l.compute_dtype)
                if not any(isinstance(leaf, jax.core.Tracer)
                           for leaf in jax.tree_util.tree_leaves(packed)):
                    self._fused_pack_cache = (pcnn_vars, packed)
            return make_fused_logits_fn(
                pcnn_vars, masks, nr_resnet=l.nr_resnet,
                max_dilation=l.max_dilation, num_classes=l.num_classes,
                compute_dtype=l.compute_dtype, packed=packed,
            )

        def fn(codes, filled):
            return self.pixelcnn_logits_codes(pcnn_vars, codes, filled, masks)

        return fn

    def decode_image(self, proj_vars, combined, bg_mask, *, train=False,
                     rngs=None, noise_scale: float = 1.0):
        mutable = ["batch_stats", "spectral_stats"] if train else False
        out = self.projector.apply(
            proj_vars, combined, bg_mask, train=train, rngs=rngs,
            mutable=mutable, noise_scale=noise_scale,
        )
        return out if train else (out, None)

    def combine(self, gen_fs, decoded, bg_mask):
        """foreground splat + background AR content (z_buffermodel.py:703-708)."""
        bg = bg_mask.astype(gen_fs.dtype)[..., None]
        return gen_fs * (1.0 - bg) + decoded * bg

    # -- full forwards -----------------------------------------------------

    def train_forward(
        self,
        gen_vars: Dict,
        frozen_vars: Dict,
        batch: Dict,
        rngs: Dict,
        *,
        train_ar: bool = True,
        train: bool = True,
        noise_scale: float = 1.0,
    ):
        """Stage-2 training forward (z_buffermodel.py:291-419, train mode).

        noise_scale=0.0 gives a deterministic eval (NoiseBN gain=1/bias=0):
        the reference draws fresh BN-conditioning noise at every forward
        (normalization.py:21-47), which caps eval PSNR against a fixed GT.

        gen_vars: trainable trees {"unet", "projector", "pixelcnn"[, "encoder"]}.
        frozen_vars: {"vqvae", "vgg"} (the reference freezes the VQ-VAE at
        stage 2, train_dpr.py:422-434).
        batch: {"input_img", "output_img" (B,W,W,3 in [-1,1]),
                "K","Kinv","P_in","Pinv_in","P_out","Pinv_out" (B,4,4)}.
        Returns (total_loss, aux) with aux = (losses dict, outputs dict,
        variable updates dict).
        """
        img = batch["input_img"]
        out_img = batch["output_img"]
        cams = {k: batch[k] for k in ("K", "Kinv", "P_in", "Pinv_in", "P_out")}

        if self.cfg.model.use_gt_depth and "depth_img" in batch:
            # ground-truth depth path (z_buffermodel.py:315-316)
            depth, unet_upd = batch["depth_img"], None
        else:
            depth, unet_upd = self.regress_depth(
                gen_vars["unet"], img, train=train, rngs=rngs
            )
        all_vars = dict(gen_vars)
        fs, enc_upd = self.features(all_vars, img, train=train, rngs=rngs,
                                    noise_scale=noise_scale)
        gen_fs, bg, _ = self.splat_view(fs, depth, cams)
        if self.modifier is not None and "modifier" in gen_vars:
            mutable = ["batch_stats", "spectral_stats"] if train else False
            # (the modifier U-Net has no noise-conditioned layers)
            mod_out = self.modifier.apply(
                gen_vars["modifier"], gen_fs, train=train, rngs=rngs,
                mutable=mutable,
            )
            gen_fs = mod_out[0] if train else mod_out

        updates = {"unet": unet_upd}
        if enc_upd is not None:
            updates["encoder"] = enc_upd

        losses: Dict[str, jnp.ndarray] = {}
        ar_loss = None
        if train_ar and not self.cfg.model.no_outpainting:
            order, masks, bg_ds = self.masks_for_background(bg)
            masks = jax.lax.stop_gradient(masks)
            codes, _ = self.vq_encode(frozen_vars["vqvae"], out_img)
            oh = jax.nn.one_hot(codes, self.cfg.model.lmconv.num_classes)
            ar_logits = self.pixelcnn_logits(
                gen_vars["pixelcnn"], oh, masks, train=train, rngs=rngs
            )
            ar_loss = _softmax_xent(ar_logits, codes)
        else:
            codes, _ = self.vq_encode(frozen_vars["vqvae"], out_img)

        # ground-truth background stand-in: decoded GT codes
        # (z_buffermodel.py:370-380); VQ-VAE is frozen
        input_gt = jax.lax.stop_gradient(
            self.vq_decode(frozen_vars["vqvae"], codes)
        )
        combined = self.combine(gen_fs, input_gt, bg)
        gen_img, proj_upd = self.decode_image(
            gen_vars["projector"], combined, bg, train=train, rngs=rngs,
            noise_scale=noise_scale,
        )
        updates["projector"] = proj_upd

        vgg_apply = lambda im: self.vgg.apply(frozen_vars["vgg"], im)
        losses.update(
            synthesis_loss(gen_img, out_img, losses=self.cfg.loss.losses,
                           vgg_apply=vgg_apply)
        )
        total = losses["Total Loss"]
        if ar_loss is not None:
            lam = self.cfg.loss.lambda_autoreg
            total = total + ar_loss * (1.0 if lam is None else lam)
            # bits-per-dim-style report (z_buffermodel.py:398)
            losses["autoreg_loss"] = ar_loss / np.log(2.0)
        if self.cfg.model.train_depth and "depth_img" in batch:
            # supervised depth L1 (z_buffermodel.py:404-407)
            depth_loss = jnp.mean(jnp.abs(depth - batch["depth_img"]))
            total = total + depth_loss
            losses["depth_loss"] = depth_loss
        losses["Total Loss"] = total

        outputs = {
            "PredImg": gen_img,
            "OutputImg": out_img,
            "InputImg": img,
            "PredDepthImg": depth / 5.0 - 1.0,
            "ForegroundImg": (~bg).astype(jnp.float32),
        }
        return total, (losses, outputs, updates)

    def forward_angle(self, variables, img, K, Kinv, RTs, *, rng=None,
                      return_depth: bool = False):
        """Render a list of output extrinsics from one image without
        outpainting (z_buffermodel.py:710-754); the noise stream is reset
        per view so stochastic layers match across angles (739-741)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        B = img.shape[0]
        I = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
        depth, _ = self.regress_depth(variables["unet"], img)
        fs, _ = self.features(variables, img)
        gen_imgs = []
        for RT in RTs:
            cams = {"K": K, "Kinv": Kinv, "P_in": I, "Pinv_in": I,
                    "P_out": jnp.asarray(RT)}
            gen_fs, bg, _ = self.splat_view(fs, depth, cams)
            mask_arg = None if self.cfg.model.no_outpainting else bg
            gen_img, _ = self.decode_image(
                variables["projector"], gen_fs, mask_arg, rngs={"noise": rng}
            )
            gen_imgs.append(gen_img)
        if return_depth:
            return gen_imgs, depth
        return gen_imgs

    def render_no_outpaint(self, variables, img, cams, *, rngs=None,
                           noise_scale: float = 1.0):
        """The minimum end-to-end slice (no_outpainting path,
        z_buffermodel.py:382-383): depth -> project -> splat -> decode."""
        depth, _ = self.regress_depth(variables["unet"], img)
        fs, _ = self.features(variables, img, noise_scale=noise_scale)
        gen_fs, bg, _ = self.splat_view(fs, depth, cams)
        # the outpainting decoder is constructed with the foreground-channel
        # input (utilities.py:30-34), so the mask is always passed; a
        # dedicated no_outpainting config drops it at construction time
        mask_arg = None if self.cfg.model.no_outpainting else bg
        gen_img, _ = self.decode_image(
            variables["projector"], gen_fs, mask_arg, rngs=rngs,
            noise_scale=noise_scale,
        )
        return {"PredImg": gen_img, "PredDepth": depth, "Background": bg,
                "FeaturesImg": gen_fs}
