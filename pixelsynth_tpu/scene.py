"""Scene generation: the cumulative multi-view walk with batched sampling.

Re-designs the reference's forward_scene (models/z_buffermodel.py:421-592)
+ get_best_sample (244-276): per direction, render the full-rotation view
first, then sweep back toward the input, carrying the growing point cloud;
at every view, ALL num_samples outpainting candidates advance together in
one jitted population (the reference loops candidates in Python, each with
its own <=1024-step sequential pixel loop -- SURVEY.md's north-star
bottleneck).

One compiled `view_step` serves every view of every direction: the camera
matrices, carried cloud, and population RNG are data.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.geometry.paths import get_rt_from_rot, num_split_for_direction
from pixelsynth_tpu.models.classifier import ResNet18, preprocess_for_classifier
from pixelsynth_tpu.pipeline import CloudState, PixelSynth
from pixelsynth_tpu.sampling import (
    ar_sample,
    ar_sample_speculative,
    classifier_entropy,
    d_fake_score,
    rank_candidates_jax,
)


def _tile(x: jnp.ndarray, s: int) -> jnp.ndarray:
    return jnp.repeat(x, s, axis=0)


class SceneGenerator:
    """Drives gen_scene / gen_two_imgs with a single jitted view step."""

    def __init__(
        self,
        ps: PixelSynth,
        variables: Dict,
        *,
        num_samples: Optional[int] = None,
        temperature: Optional[float] = None,
        cloud_capacity: int = 4 * 65536,
        classifier_vars: Optional[Dict] = None,
        mesh=None,
        noise_mode: Optional[str] = None,
        carry: Optional[str] = None,
        anchor_input: Optional[bool] = None,
    ):
        """mesh: optional jax.sharding.Mesh -- the candidate population is
        then sharded over the mesh's data axis, so every chip advances its
        slice of the samples in the same loop (the BASELINE "one sharded
        sampling loop"; num_samples should be a multiple of the axis size).

        Walk-stability knobs (defaults come from cfg.sample; measured on
        hardware in evidence/scene_drift_r5.json -- the reference-faithful
        settings compound drift until a 40-view walk loses all structure,
        VERDICT r4 missing #2):

        noise_mode: how the decoder's noise-conditioned BN stream is drawn.
          "per_view"  fresh draw every view (reference semantics: a new
                      noise vector per forward, normalization.py:21-47) --
                      visibly flickers adjacent views;
          "fixed"     ONE per-scene draw reused by every view;
          "zero"      deterministic eval (noise_scale=0, gain=1/bias=0).
        carry: which image the walk re-encodes as the next view's input
          (z_buffermodel.py:516,584 carries the refinement-decoder output;
          iterating a small decoder 40x compounds its reconstruction error
          exponentially).
          "decoder"    reference semantics: carry gen_img;
          "composite"  carry the pre-refinement composite (splat foreground
                       + VQ-decoded outpaint, z_buffermodel.py:703-708) --
                       the splat roundtrip is geometry-exact, so visible
                       content stops decaying; the decoder still refines
                       every DISPLAYED view exactly once.
        anchor_input: when the walk renders at the exact input pose
          (numerator 0 of the 8 rotation directions -- rotvec*0 == P_in),
          reset the carried image to the true input.  Measured NEGATIVE on
          hardware (evidence/scene_drift_r5_postfix.json full_zero: adj
          37.0 -> 33.3): with the cloud rendering fixed, the carry only
          contributes its outpainted sliver, so anchoring just discards
          that sliver's continuity.  Kept off by default."""
        from pixelsynth_tpu.utils.devices import put_variables

        self.ps = ps
        # commit weights to device ONCE: host-backed trees would otherwise
        # be re-uploaded on every jitted view step (the r3 view-time
        # regression -- see utils/devices.py)
        self.variables = put_variables(variables, mesh)
        classifier_vars = put_variables(classifier_vars, mesh)
        sc = ps.cfg.sample
        self.num_samples = num_samples if num_samples is not None else sc.num_samples
        self.temperature = temperature if temperature is not None else sc.temperature
        self.cloud_capacity = cloud_capacity
        self.noise_mode = noise_mode if noise_mode is not None else sc.noise_mode
        assert self.noise_mode in ("per_view", "fixed", "zero"), self.noise_mode
        self.carry = carry if carry is not None else sc.carry
        assert self.carry in ("decoder", "composite"), self.carry
        self.anchor_input = (anchor_input if anchor_input is not None
                             else sc.anchor_input)
        # noise_scale is a trace-time constant of the jitted view step
        self._noise_scale = 0.0 if self.noise_mode == "zero" else 1.0
        if classifier_vars is not None:
            from pixelsynth_tpu.models.classifier import classifier_num_classes

            self.classifier = ResNet18(
                num_classes=classifier_num_classes(classifier_vars))
        else:
            self.classifier = ResNet18()
        self.classifier_vars = classifier_vars
        if classifier_vars is None and self.num_samples > 1:
            # the reference always re-ranks with D_Fake + Places365 entropy
            # (z_buffermodel.py:244-276, demo.py:233-243); without classifier
            # weights the entropy term is zero and ranking silently becomes
            # discriminator-only -- say so instead of degrading quietly
            import warnings

            warnings.warn(
                "SceneGenerator: no Places365 classifier weights supplied; "
                "candidate re-ranking uses the discriminator score only "
                "(reference combines 0.5*D_Fake + 0.5*classifier entropy). "
                "Export resnet18_places365.npz with "
                "tools/export_torch_weights.py and pass classifier_vars.",
                stacklevel=2,
            )
        self.mesh = mesh
        self._view_step = jax.jit(self._view_step_impl)

    def _shard_population(self, x):
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(self.mesh.axis_names[0], *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec)
        )

    # -- jitted single-view step ------------------------------------------

    def _view_step_impl(self, variables, classifier_vars, img, cams,
                        cloud: CloudState, last_bg, RTinv_last, rng,
                        noise_rng):
        ps = self.ps
        S = self.num_samples
        depth, _ = ps.regress_depth(variables["unet"], img)
        fs, _ = ps.features(variables, img, noise_scale=self._noise_scale)
        gen_fs, bg, new_cloud = ps.splat_cumulative(
            fs, depth, cams, cloud, last_bg, RTinv_last
        )
        order, masks, bg_ds = ps.masks_for_background(bg)
        codes, _ = ps.vq_encode(variables["vqvae"], gen_fs)
        B = img.shape[0]

        def population_branch(_):
            # ---- population sampling: all S candidates at once, sharded
            # over the mesh data axis when one is attached ----
            nc = ps.cfg.model.lmconv.num_classes
            codes_s = self._shard_population(_tile(codes, S))
            masks_s = self._shard_population(_tile(masks, S))
            order_s = self._shard_population(_tile(order, S))
            bg_ds_s = self._shard_population(_tile(bg_ds, S))

            logits_fn = ps.make_sampling_logits_fn(
                variables["pixelcnn"], masks_s)

            spec = ps.cfg.sample.speculative
            if spec > 0:
                sampled = ar_sample_speculative(
                    logits_fn, codes_s, order_s, bg_ds_s, rng,
                    num_classes=nc, temperature=self.temperature, spec=spec,
                )
            else:
                sampled = ar_sample(
                    logits_fn, codes_s, order_s, bg_ds_s, rng,
                    num_classes=nc, temperature=self.temperature,
                )
            decoded = ps.vq_decode(variables["vqvae"], sampled)
            combined = ps.combine(_tile(gen_fs, S), decoded, _tile(bg, S))
            gen_imgs, _ = ps.decode_image(
                variables["projector"], combined, _tile(bg, S),
                rngs={"noise": noise_rng}, noise_scale=self._noise_scale,
            )

            # ---- candidate scoring (z_buffermodel.py:244-276) ----
            def disc_apply(x, train=False):
                return ps.disc.apply(variables["disc"], x, train=False)

            d_scores = d_fake_score(disc_apply, gen_imgs, _tile(img, S))
            if classifier_vars is not None:
                logits = self.classifier.apply(
                    classifier_vars,
                    preprocess_for_classifier(gen_imgs * 0.5 + 0.5),
                )
                entropy = classifier_entropy(logits)
            else:
                entropy = jnp.zeros((gen_imgs.shape[0],))
            return (gen_imgs.astype(jnp.float32),
                    combined.astype(jnp.float32),
                    d_scores.astype(jnp.float32),
                    entropy.astype(jnp.float32))

        def covered_branch(_):
            # nothing to outpaint anywhere in the batch: every candidate
            # carries the same codes, so decode ONCE per item and
            # broadcast -- turns the sweep-back / video-frame views whose
            # background is already filled into a single decoder pass
            # instead of S (VERDICT r2 next-#3).  The population path
            # would still differ per candidate by the decoder's
            # noise-conditioned-BN draw; with nothing sampled that
            # variation carries no signal, so collapsing it is the point.
            decoded = ps.vq_decode(variables["vqvae"], codes)
            combined = ps.combine(gen_fs, decoded, bg)
            one_imgs, _ = ps.decode_image(
                variables["projector"], combined, bg, rngs={"noise": noise_rng},
                noise_scale=self._noise_scale,
            )
            gen_imgs = _tile(one_imgs, S).astype(jnp.float32)
            zeros = jnp.zeros((B * S,), jnp.float32)
            return gen_imgs, _tile(combined, S).astype(jnp.float32), zeros, zeros

        # cell-level coverage: sampling happens on the 32x32 code grid, so
        # "covered" means no fully-background cell survives downsampling
        any_bg_cell = jnp.any(bg_ds >= 1.0 - 1e-6)
        gen_imgs, combined, d_scores, entropy = jax.lax.cond(
            any_bg_cell, population_branch, covered_branch, operand=None
        )

        # ---- per-item best candidate, selected in-graph so the walk needs
        # no host round trip between views ----
        d_bs = d_scores.reshape(B, S)
        e_bs = entropy.reshape(B, S)
        best = jax.vmap(rank_candidates_jax)(d_bs, e_bs)        # (B,)
        best_idx = jnp.arange(B) * S + best
        best_img = gen_imgs[best_idx]
        # what the walk re-encodes next view (see __init__ docstring):
        # the decoder output (reference) or the pre-refinement composite
        best_carry = combined[best_idx] if self.carry == "composite" else best_img

        return {
            "gen_imgs": gen_imgs,
            "d_scores": d_scores,
            "entropy": entropy,
            "best_img": best_img,
            "best_carry": best_carry,
            "bg": bg,
            "depth": depth,
            "gen_fs": gen_fs,
            "cloud": new_cloud,
        }

    # -- host-side walk ----------------------------------------------------

    def generate_view(self, img, cams, cloud, last_bg, RTinv_last, rng,
                      noise_rng=None):
        """One outpainted view for a batch of B items: the population is
        B*S candidates (item-major); the per-item best is rank-selected
        (z_buffermodel.py:264-276).  Returns ((B, W, W, 3) best images,
        raw step outputs).

        noise_rng: decoder noise stream; a scene walk passes one fixed key
        under noise_mode="fixed" -- standalone calls derive it from rng."""
        if noise_rng is None:
            noise_rng = jax.random.fold_in(rng, 1)
        out = self._view_step(
            self.variables, self.classifier_vars, img, cams, cloud,
            last_bg, RTinv_last, rng, noise_rng,
        )
        # best candidate is selected in-graph (rank_candidates_jax): no
        # host synchronization between consecutive views of a walk
        return out["best_img"], out

    def generate_scene(
        self,
        img: jnp.ndarray,
        K: jnp.ndarray,
        Kinv: jnp.ndarray,
        P_in: jnp.ndarray,
        Pinv_in: jnp.ndarray,
        *,
        directions: Optional[List[str]] = None,
        num_split: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        two_imgs: bool = False,
        sequential: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Full scene walk (z_buffermodel.py:421-592).

        Non-sequential mode (default): jump to the full rotation first,
        then sweep back toward the input (z_buffermodel.py:471-529).
        sequential=True walks outward 0..num_split instead
        (opt.sequential_outpainting, z_buffermodel.py:531-589).

        Returns {"PredImg_<dir>_<i>": (1,W,W,3) in [-1,1], ...} plus
        depth/foreground entries for the full-rotation view of each
        direction, keyed exactly like the reference's outputs dict.
        """
        ps = self.ps
        sc = ps.cfg.sample
        directions = list(directions or sc.directions)
        base_split = num_split if num_split is not None else sc.num_split
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # pose-path math is host-side numpy (geometry/paths.py): one
        # readback here instead of one per get_rt_from_rot call
        P_in = np.asarray(P_in)
        Pinv_in = np.asarray(Pinv_in)

        B = img.shape[0]
        feat_dim = img.shape[-1]
        cloud = CloudState.empty(B, self.cloud_capacity, feat_dim)
        I = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

        current_img = img
        last_bg = jnp.zeros((B, ps.W, ps.W), bool)  # nothing carried yet
        RTinv_last = Pinv_in
        last_numerator = None
        last_direction = None
        outputs: Dict[str, np.ndarray] = {"InputImg": np.asarray(img)}
        first_view = True
        # one decoder-noise draw for the WHOLE scene under "fixed": every
        # view shares the same noise-conditioned BN modulation, so adjacent
        # views cannot flicker against each other (VERDICT r4 weak #2)
        scene_noise_rng = (jax.random.fold_in(rng, 0xF1)
                           if self.noise_mode == "fixed" else None)

        for direction in directions:
            n_split = num_split_for_direction(direction, base_split, two_imgs)

            # view order: full rotation first then sweep back, or walk
            # outward in sequential mode (z_buffermodel.py:478,529-531)
            if sequential:
                numerators = list(range(n_split + 1))
            else:
                numerators = [n_split] + list(reversed(range(n_split)))
            for numerator in numerators:
                if last_numerator is None:
                    cin_inv, cin = Pinv_in, P_in
                else:
                    cin_inv, cin = get_rt_from_rot(
                        last_direction, P_in, last_numerator, n_split
                    )
                cout_inv, cout = get_rt_from_rot(direction, P_in, numerator, n_split)
                cams = {"K": K, "Kinv": Kinv, "P_in": cin, "Pinv_in": cin_inv,
                        "P_out": cout}
                rng, sub = jax.random.split(rng)
                best_img, out = self.generate_view(
                    current_img, cams,
                    cloud, None if first_view else last_bg, RTinv_last, sub,
                    noise_rng=scene_noise_rng,
                )
                key = f"PredImg_{direction}_{numerator}"
                outputs[key] = best_img
                # splatted-feature image, every view (z_buffermodel.py:524,575)
                outputs[f"FeaturesImg_{direction}_{numerator}"] = out["gen_fs"]
                if numerator == n_split:
                    outputs[f"PredDepthImg_{direction}_{numerator}"] = out["depth"]
                    outputs[f"ForegroundImg_{direction}_{numerator}"] = (
                        (~out["bg"]).astype(jnp.float32)
                    )
                if (self.anchor_input and numerator == 0
                        and direction not in ("S", "C")):
                    # rotvec * 0/denom == P_in exactly (geometry/paths.py):
                    # the true observation at this camera is the input image
                    current_img = img
                else:
                    current_img = out["best_carry"]
                cloud = out["cloud"]
                last_bg = out["bg"]
                RTinv_last = cout_inv
                last_numerator = numerator
                last_direction = direction
                first_view = False

        # end-of-walk cloud occupancy: how full the fixed-capacity buffer
        # got (sizing signal for cloud_capacity -- the splat's sort cost is
        # linear in capacity, not occupancy)
        outputs["CloudValidCount"] = cloud.valid.sum(axis=1)

        # one transfer at the end: every view above was dispatched
        # asynchronously (nothing in the loop forces a readback), so the
        # device pipeline runs ahead of the host walk
        return {k: np.asarray(v) for k, v in outputs.items()}


def batch_rt_from_rot(directions: List[str], input_RT, num, denom):
    """Per-item camera paths: stack get_rt_from_rot over a batch whose
    direction differs per item (the consistency eval's per-index fixed
    directions, eval_consistency.py:101-149)."""
    input_RT = np.asarray(input_RT)
    invs, rts = [], []
    for b, d in enumerate(directions):
        inv, rt = get_rt_from_rot(d, input_RT[b], num, denom)
        invs.append(inv)
        rts.append(rt)
    return np.stack(invs), np.stack(rts)


class TwoImageGenerator(SceneGenerator):
    """Batched gen_two_imgs: full + half rotation per item, each item with
    its own consistency direction -- the whole item batch advances through
    one sampling population per view (the reference renders one item at a
    time, forward_scene with num_split=2, z_buffermodel.py:425-453)."""

    def generate_two_imgs(self, img, K, Kinv, P_in, Pinv_in, directions,
                          rng=None):
        """img: (B, W, W, 3); directions: list[str] of length B.
        Returns {"PredImg_2": full-rotation views, "PredImg_1": half}."""
        import jax

        ps = self.ps
        B = img.shape[0]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        P_in, Pinv_in = np.asarray(P_in), np.asarray(Pinv_in)
        cloud = CloudState.empty(B, self.cloud_capacity, img.shape[-1])

        outputs = {}
        current_img = img
        last_bg = None
        RTinv_last = Pinv_in
        cin, cin_inv = P_in, Pinv_in
        last_numerator = None
        scene_noise_rng = (jax.random.fold_in(rng, 0xF1)
                           if self.noise_mode == "fixed" else None)
        for numerator in (2, 1, 0):
            cout_inv, cout = batch_rt_from_rot(directions, P_in, numerator, 2)
            cams = {"K": K, "Kinv": Kinv, "P_in": cin, "Pinv_in": cin_inv,
                    "P_out": cout}
            rng, sub = jax.random.split(rng)
            best_img, out = self.generate_view(
                current_img, cams, cloud, last_bg, RTinv_last, sub,
                noise_rng=scene_noise_rng,
            )
            outputs[f"PredImg_{numerator}"] = best_img
            current_img = out["best_carry"]
            cloud = out["cloud"]
            last_bg = out["bg"]
            RTinv_last = cout_inv
            cin_inv, cin = cout_inv, cout
        return {k: np.asarray(v) for k, v in outputs.items()}


def video_frame_order(num_split: int) -> List[Tuple[str, int]]:
    """Frame sequence of the demo video (demo.py:128-164):
    R 0, then for each of R L C C S S: ascending 1..n-1, and for
    non-path directions also descending n-1..0."""
    frames: List[Tuple[str, int]] = [("R", 0)]
    for direction in ["R", "L", "C", "C", "S", "S"]:
        n = num_split * 2 if direction in ("S", "C") else num_split
        frames.extend((direction, i) for i in range(1, n))
        if direction not in ("S", "C"):
            frames.extend((direction, i) for i in range(n - 1, -1, -1))
    return frames
