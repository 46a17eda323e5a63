"""Demo entry point: single image -> novel view or full explorable scene.

Mirrors demo.py (reference): gen_img renders one rotated view with
outpainting + best-of-N sampling; gen_scene walks all directions with the
cumulative point cloud and writes the scene grid + video frame sequence
(R -> L -> C -> C -> S -> S, demo.py:125-164), then assembles an mp4.

Usage:
  python -m pixelsynth_tpu.demo --img demo.png --mode gen_scene \
      --result-folder out/ [--ckpt-dir runs/] [--num-samples 2]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import jax
import numpy as np

# persistent compilation cache: the scene walk reuses one compiled view
# step, but the first compile is ~50 s -- cache it across CLI invocations
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PIXELSYNTH_CACHE", os.path.expanduser("~/.cache/pixelsynth_tpu")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from pixelsynth_tpu.config import Config
from pixelsynth_tpu.data.demo_data import demo_cameras, load_demo_image
from pixelsynth_tpu.eval.harness import save_png
from pixelsynth_tpu.geometry.paths import get_rt_from_rot, num_split_for_direction
from pixelsynth_tpu.pipeline import CloudState, PixelSynth
from pixelsynth_tpu.scene import SceneGenerator, video_frame_order


def load_ported_weights(variables: Dict, weights_dir: Optional[str]):
    """Load converted torchvision/Places365 weights when available
    (tools/export_torch_weights.py output).  Returns (variables,
    classifier_vars or None)."""
    classifier_vars = None
    weights_dir = weights_dir or os.environ.get("PIXELSYNTH_WEIGHTS")
    if not weights_dir:
        return variables, classifier_vars
    vgg_path = os.path.join(weights_dir, "vgg19_features.npz")
    if os.path.exists(vgg_path):
        from pixelsynth_tpu.models.losses import load_torch_vgg19

        variables = {**variables, "vgg": load_torch_vgg19(vgg_path)}
        print(f"loaded VGG19 weights from {vgg_path}")
    cls_path = os.path.join(weights_dir, "resnet18_places365.npz")
    if os.path.exists(cls_path):
        from pixelsynth_tpu.models.classifier import load_torch_resnet18

        classifier_vars = load_torch_resnet18(cls_path)
        print(f"loaded Places365 classifier from {cls_path}")
    scene_cls = os.path.join(weights_dir, "scene_classifier.npz")
    if classifier_vars is None and os.path.exists(scene_cls):
        # in-repo substitute trained on panorama worlds
        # (tools/train_scene_classifier.py) -- same role, same ranking math
        from pixelsynth_tpu.models.classifier import load_classifier_npz

        classifier_vars = load_classifier_npz(scene_cls)
        print(f"loaded scene classifier from {scene_cls}")
    return variables, classifier_vars


def load_model(ckpt_dir: Optional[str], cfg: Optional[Config] = None):
    """Build PixelSynth + variables; restores a DPR checkpoint's config and
    generator trees when available (the reference stitches DPR + vqvae +
    AR + places365 checkpoints at demo.py:198-243; our DPR checkpoint
    already carries every tree)."""
    from pixelsynth_tpu.checkpoint import CheckpointManager
    from pixelsynth_tpu.train.dpr import create_dpr_state
    from pixelsynth_tpu.utils.devices import put_variables

    if ckpt_dir is not None and ckpt_dir.endswith(".npz"):
        # single-file stitched artifact (tools/stitch_checkpoint.py)
        from pixelsynth_tpu.tools.stitch_checkpoint import load_stitched_npz

        cfg, stitched, _ = load_stitched_npz(ckpt_dir)
        cfg.refresh_splat_perf_knobs()
        ps = PixelSynth(cfg)
        # a complete artifact carries every runtime tree -- skip the
        # full random init (~2 min on CPU) that it would overwrite anyway
        needed = {"unet", "vqvae", "pixelcnn", "projector", "disc"}
        if ps.encoder is not None:
            needed.add("encoder")
        if needed <= set(stitched):
            return ps, put_variables(stitched)
        variables = ps.init_variables(jax.random.PRNGKey(0))
        return ps, put_variables({**variables, **stitched})
    if ckpt_dir is not None:
        mgr = CheckpointManager(os.path.join(ckpt_dir, "dpr"))
        cfg = mgr.load_config() or cfg or Config()
        cfg.refresh_splat_perf_knobs()
        ps = PixelSynth(cfg)
        variables = ps.init_variables(jax.random.PRNGKey(0))
        state, _, _ = create_dpr_state(ps, variables)
        state = mgr.restore(state)
        mgr.close()
        variables = {**variables, **state.gen_vars,
                     **state.frozen_vars, "disc": state.disc_vars}
        return ps, put_variables(variables)
    cfg = cfg or Config()
    ps = PixelSynth(cfg)
    return ps, put_variables(ps.init_variables(jax.random.PRNGKey(0)))


def save_scene(outputs: Dict[str, np.ndarray], cfg: Config, result_folder: str):
    """demo.py:100-124 layout."""
    for direction in cfg.sample.directions:
        if direction in ("S", "C"):
            continue
        n = num_split_for_direction(direction, cfg.sample.num_split)
        for i in range(1, n + 1):
            key = f"PredImg_{direction}_{i}"
            if key in outputs:
                save_png(os.path.join(result_folder, "scene",
                                      f"output_image_{direction}_{i:04d}.png"),
                         outputs[key][0])


def save_video_frames(outputs: Dict[str, np.ndarray], cfg: Config,
                      result_folder: str) -> str:
    video_dir = os.path.join(result_folder, "video")
    for ct, (direction, i) in enumerate(video_frame_order(cfg.sample.num_split)):
        key = f"PredImg_{direction}_{i}"
        if key in outputs:
            save_png(os.path.join(video_dir, f"{ct}.png"), outputs[key][0])
    return video_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", required=True)
    ap.add_argument("--mode", default="gen_scene",
                    choices=["gen_img", "gen_scene"])
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--result-folder", default="demo_out")
    ap.add_argument("--direction", default="R")
    ap.add_argument("--rotation", type=float, default=0.3)
    ap.add_argument("--num-split", type=int, default=None)
    ap.add_argument("--num-samples", type=int, default=None)
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fps", type=int, default=10)
    # walk-stability knobs (SceneGenerator docstring; measured in
    # evidence/scene_drift_r5_postfix.json).  Default: checkpoint config
    # (product: fixed/composite).  --noise-mode per_view --carry decoder
    # reproduces the reference's walk semantics exactly.
    ap.add_argument("--noise-mode", default=None,
                    choices=["per_view", "fixed", "zero"])
    ap.add_argument("--carry", default=None, choices=["decoder", "composite"])
    ap.add_argument("--weights-dir", default=None,
                    help="dir with converted eval-net npz weights "
                         "(vgg19_features.npz, resnet18_places365.npz)")
    args = ap.parse_args(argv)

    if not os.path.exists(args.img):
        raise SystemExit(f"error: input image not found: {args.img}")

    ps, variables = load_model(args.ckpt_dir)
    # a stitched artifact may carry its own re-ranking classifier
    # (tools/stitch_checkpoint.py --classifier); explicit --weights-dir
    # Places365 weights override it below when present
    stitched_classifier = variables.pop("classifier", None)
    variables, classifier_vars = load_ported_weights(variables, args.weights_dir)
    if classifier_vars is None and stitched_classifier is not None:
        classifier_vars = stitched_classifier
        print("using the stitched checkpoint's scene classifier for re-ranking")
    cfg = ps.cfg
    if args.num_split is not None:
        cfg.sample.num_split = args.num_split

    img, ratio = load_demo_image(args.img, cfg.model.W)
    cams = demo_cameras(ratio)
    gen = SceneGenerator(
        ps, variables,
        num_samples=args.num_samples, temperature=args.temperature,
        classifier_vars=classifier_vars,
        noise_mode=args.noise_mode, carry=args.carry,
    )
    rng = jax.random.PRNGKey(args.seed)

    if args.mode == "gen_img":
        RTinv, RT = get_rt_from_rot(
            args.direction, cams["P"], scene_mode=False, rotation=args.rotation
        )
        view_cams = {"K": cams["K"], "Kinv": cams["Kinv"],
                     "P_in": cams["P"], "Pinv_in": cams["Pinv"],
                     "P_out": np.asarray(RT)}
        cloud = CloudState.empty(1, ps.W * ps.W, 3)
        best_img, out = gen.generate_view(
            img, view_cams, cloud, None, cams["Pinv"], rng
        )
        save_png(os.path.join(
            args.result_folder,
            f"output_image_{args.direction}_{int(args.rotation)}.png",
        ), np.asarray(best_img[0]))
        save_png(os.path.join(
            args.result_folder,
            f"input_fs_image_{args.direction}_{int(args.rotation)}.png",
        ), np.asarray(out["gen_fs"][0]))
        print(f"wrote novel view to {args.result_folder}")
        return

    outputs = gen.generate_scene(
        img, cams["K"], cams["Kinv"], cams["P"], cams["Pinv"], rng=rng
    )
    save_scene(outputs, cfg, args.result_folder)
    video_dir = save_video_frames(outputs, cfg, args.result_folder)
    from pixelsynth_tpu.utils.video import create_video

    ok = create_video(video_dir, os.path.join(args.result_folder, "scene.mp4"),
                      fps=args.fps)
    print(f"scene written to {args.result_folder} (video={'ok' if ok else 'frames only'})")


if __name__ == "__main__":
    main()
