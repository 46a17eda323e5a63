"""Stitch the trained stages into one scene-generating checkpoint.

The reference's inference preamble assembles four separately-trained
artifacts -- pixelsynth.pth (DPR), vqvae.pth, autoregressive.pth, and the
Places365 classifier -- at every run (demo.py:198-243).  Here the stitched
result is saved once, in two forms:

  * an orbax DPR-format checkpoint directory the demo CLI's --ckpt-dir
    loads unchanged (demo.load_model);
  * a single compressed .npz (float16 weights + the JSON config) small
    enough to commit as the round's capability artifact; demo.load_model
    accepts a path to it directly.

Usage:
  python -m pixelsynth_tpu.tools.stitch_checkpoint \
      --dpr runs/relay/dpr_final --vqvae runs/relay/vqvae \
      --lmconv runs/relay/lmconv --out runs/relay/stitched \
      [--npz evidence/relay/stitched.npz]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from pixelsynth_tpu.config import Config

_SCALAR_PREFIX = "__scalar__"


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            assert "/" not in str(k), f"key {k!r} contains '/'"
            out.update(flatten_tree(v, f"{prefix}{k}/"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict:
    root: Dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def save_stitched_npz(path: str, variables: Dict, cfg: Config,
                      meta: Optional[Dict] = None):
    """float16-cast compressed archive of the variable trees + config."""
    flat = flatten_tree(variables)
    arrays = {}
    for k, v in flat.items():
        arrays[k] = v.astype(np.float16) if v.dtype == np.float32 else v
    arrays["__config__"] = np.frombuffer(
        cfg.to_json().encode(), dtype=np.uint8
    )
    if meta:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_stitched_npz(path: str) -> Tuple[Config, Dict, Dict]:
    """-> (cfg, variables (float32), meta)."""
    data = np.load(path)
    cfg = Config.from_json(bytes(data["__config__"]).decode())
    meta = (json.loads(bytes(data["__meta__"]).decode())
            if "__meta__" in data.files else {})
    flat = {}
    for k in data.files:
        if k.startswith("__"):
            continue
        v = data[k]
        flat[k] = v.astype(np.float32) if v.dtype == np.float16 else v
    return cfg, unflatten_tree(flat), meta


def load_dpr_state(ckpt_dir: str, cfg: Optional[Config] = None,
                   prefer_best: bool = True):
    """Restore a DPR checkpoint (best step when tracked) -> (ps, state, cfg)."""
    from pixelsynth_tpu.checkpoint import CheckpointManager
    from pixelsynth_tpu.pipeline import PixelSynth
    from pixelsynth_tpu.train.dpr import create_dpr_state

    mgr = CheckpointManager(ckpt_dir)
    cfg = mgr.load_config() or cfg
    ps = PixelSynth(cfg)
    variables = ps.init_variables(jax.random.PRNGKey(0))
    state, _, _ = create_dpr_state(ps, variables)
    step = (mgr.best_step() if prefer_best else None) or mgr.latest_step()
    state = mgr.restore(state, step=step)
    mgr.close()
    return ps, state, cfg


def load_vqvae_variables(ckpt_dir: str, cfg: Config) -> Dict:
    from pixelsynth_tpu.checkpoint import CheckpointManager
    from pixelsynth_tpu.models.vqvae import VQVAETop
    from pixelsynth_tpu.train.vqvae import create_vqvae_state

    v = cfg.model.vqvae
    model = VQVAETop(in_channel=v.in_channel, channel=v.channel,
                     n_res_block=v.n_res_block, n_res_channel=v.n_res_channel,
                     embed_dim=v.embed_dim, n_embed=v.n_embed, decay=v.decay)
    state, _ = create_vqvae_state(model, jax.random.PRNGKey(0),
                                  img_size=cfg.model.W)
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state, step=mgr.best_step() or mgr.latest_step())
    mgr.close()
    return dict(state.variables)


def load_lmconv_variables(ckpt_dir: str, cfg: Config,
                          prefer_ema: bool = True) -> Dict:
    """Trained AR-prior tree; EMA params when present (the reference
    samples with EMA parameters, train_lmconv.py:733+606)."""
    from pixelsynth_tpu.checkpoint import CheckpointManager
    from pixelsynth_tpu.models.lmconv import LMPixelCNN
    from pixelsynth_tpu.train.lmconv import create_lmconv_state

    l = cfg.model.lmconv
    model = LMPixelCNN(
        nr_resnet=l.nr_resnet, nr_filters=l.nr_filters,
        input_channels=l.input_channels, kernel_size=l.kernel_size,
        max_dilation=l.max_dilation, feature_norm=l.feature_norm,
        dropout_prob=l.dropout_prob, num_classes=l.num_classes,
    )
    state, _ = create_lmconv_state(
        model, jax.random.PRNGKey(0), rows=l.obs[1], cols=l.obs[2],
        ema_decay=l.ema_decay,
    )
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state, step=mgr.best_step() or mgr.latest_step())
    mgr.close()
    variables = dict(state.variables)
    if prefer_ema and state.ema_params is not None:
        variables["params"] = state.ema_params
    return variables


def stitch(dpr_dir: str, out_dir: str, *, vqvae_dir: Optional[str] = None,
           lmconv_dir: Optional[str] = None, npz_path: Optional[str] = None,
           classifier_npz: Optional[str] = None,
           meta: Optional[Dict] = None) -> Dict:
    """Assemble the final variables and write both checkpoint forms.

    DPR supplies unet/projector/encoder/disc (and its frozen vqvae/vgg);
    vqvae_dir/lmconv_dir override the vqvae / pixelcnn trees with the
    stage-1 / stage-3 artifacts (demo.py:198-243 load order: the AR and VQ
    checkpoints win over what the DPR checkpoint carries).
    classifier_npz: a scene-classifier tree (models/classifier.py) packed
    into the stitched .npz under "classifier" so the artifact re-ranks
    candidates with BOTH terms (0.5*D_Fake + 0.5*entropy,
    z_buffermodel.py:244-276) out of the box."""
    import dataclasses as _dc

    from pixelsynth_tpu.checkpoint import CheckpointManager
    from pixelsynth_tpu.train.dpr import DPRTrainState, create_dpr_state

    ps, state, cfg = load_dpr_state(dpr_dir)
    variables = {**state.gen_vars, **state.frozen_vars, "disc": state.disc_vars}
    if vqvae_dir:
        variables["vqvae"] = load_vqvae_variables(vqvae_dir, cfg)
    if lmconv_dir:
        variables["pixelcnn"] = load_lmconv_variables(lmconv_dir, cfg)

    # orbax DPR-format dir (demo.load_model reads <out>/dpr)
    new_state, _, _ = create_dpr_state(ps, {**variables})
    new_state = _dc.replace(new_state, step=state.step)
    mgr = CheckpointManager(os.path.join(out_dir, "dpr"))
    mgr.save(int(state.step), jax.device_get(new_state), cfg)
    mgr.close()

    if npz_path:
        save_vars = {k: v for k, v in variables.items() if k != "vgg"}
        if classifier_npz:
            from pixelsynth_tpu.models.classifier import load_classifier_npz

            save_vars["classifier"] = load_classifier_npz(classifier_npz)
        save_stitched_npz(npz_path, jax.device_get(save_vars), cfg, meta)
    return variables


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dpr", required=True)
    ap.add_argument("--vqvae", default=None)
    ap.add_argument("--lmconv", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--npz", default=None)
    ap.add_argument("--classifier", default=None,
                    help="scene_classifier.npz to pack into the stitched npz")
    args = ap.parse_args(argv)
    stitch(args.dpr, args.out, vqvae_dir=args.vqvae, lmconv_dir=args.lmconv,
           npz_path=args.npz, classifier_npz=args.classifier)
    print(f"stitched checkpoint written to {args.out}")


if __name__ == "__main__":
    main()
