"""Train a scene classifier for candidate re-ranking on panorama worlds.

The reference re-ranks outpainting candidates by 0.5*D_Fake + 0.5*the
entropy of a Places365 ResNet-18 (models/z_buffermodel.py:244-276,
demo.py:233-243).  Places365 weights cannot be produced in this
environment (zero egress); this trains the SAME ResNet18 architecture to
classify which procedural panorama world an image came from, giving the
entropy term a real signal on the in-repo data the relay trains and
demos on: a coherent candidate view of a known world is classified
confidently (low entropy), garbage outpaintings are not.

Saves `scene_classifier.npz` (models/classifier.py save_classifier_npz
layout); demo.py picks it up from --weights-dir, SceneGenerator infers
the class count from the tree.

Usage: python -m pixelsynth_tpu.tools.train_scene_classifier \
           --out weights/ [--worlds 32] [--steps 600] [--image-size 128]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pixelsynth_tpu.models.classifier import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ResNet18,
    save_classifier_npz,
)


def _render_batch(worlds, rng: np.random.Generator, batch: int, W: int,
                  max_rotation: float) -> Tuple[np.ndarray, np.ndarray]:
    from pixelsynth_tpu.data.panorama import render_view, sample_pair_cameras

    imgs = np.zeros((batch, W, W, 3), np.float32)
    labels = np.zeros((batch,), np.int32)
    for i in range(batch):
        w = int(rng.integers(len(worlds)))
        P0, _ = sample_pair_cameras(rng, max_rotation=max_rotation)
        img, _ = render_view(worlds[w], P0, W)
        imgs[i] = img  # [-1, 1]
        labels[i] = w
    return imgs, labels


def train_scene_classifier(out_dir: str, *, num_worlds: int = 32,
                           steps: int = 600, batch: int = 16,
                           image_size: int = 128, lr: float = 1e-3,
                           seed: int = 0, eval_batches: int = 4) -> Dict:
    """Train + save; returns {"val_accuracy": ..., "path": ...}.

    image_size is the classifier input resolution -- the re-ranking path
    resizes candidates to 224 (preprocess_for_classifier); training at
    224 matches it, smaller sizes are for CPU-budget runs (the conv
    stack is resolution-agnostic)."""
    from pixelsynth_tpu.data.panorama import make_world

    rng_np = np.random.default_rng(seed)
    worlds = [make_world(rng_np) for _ in range(num_worlds)]
    model = ResNet18(num_classes=num_worlds)

    def norm(img_pm1):
        x = img_pm1 * 0.5 + 0.5
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    key = jax.random.PRNGKey(seed)
    variables = model.init({"params": key},
                           jnp.zeros((1, image_size, image_size, 3)),
                           train=False)
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, imgs, labels):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, norm(imgs),
                train=True, mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return ce, (upd["batch_stats"], logits)

        (ce, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return params, new_stats, opt_state, ce, acc

    @jax.jit
    def infer(params, batch_stats, imgs):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           norm(imgs), train=False)

    params, batch_stats = variables["params"], variables["batch_stats"]
    t0 = time.time()
    for it in range(steps):
        imgs, labels = _render_batch(worlds, rng_np, batch, image_size, 40.0)
        params, batch_stats, opt_state, ce, acc = step(
            params, batch_stats, opt_state, jnp.asarray(imgs),
            jnp.asarray(labels))
        if it % 50 == 0 or it == steps - 1:
            print(f"classifier step {it} ce={float(ce):.3f} "
                  f"acc={float(acc):.3f} ({time.time()-t0:.0f}s)", flush=True)

    # held-out viewpoints of the SAME worlds (the label space is worlds,
    # so "val" means new cameras, not new classes)
    correct = n = 0
    for _ in range(eval_batches):
        imgs, labels = _render_batch(worlds, rng_np, batch, image_size, 40.0)
        pred = np.argmax(np.asarray(infer(params, batch_stats,
                                          jnp.asarray(imgs))), -1)
        correct += int((pred == labels).sum())
        n += batch
    val_acc = correct / n

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "scene_classifier.npz")
    save_classifier_npz(path, {"params": jax.device_get(params),
                               "batch_stats": jax.device_get(batch_stats)})
    with open(os.path.join(out_dir, "scene_classifier.json"), "w") as f:
        json.dump({"num_worlds": num_worlds, "steps": steps,
                   "val_accuracy": val_acc, "image_size": image_size}, f)
    print(f"val_accuracy {val_acc:.3f} -> {path}")
    return {"val_accuracy": val_acc, "path": path}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights")
    ap.add_argument("--worlds", type=int, default=32)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    train_scene_classifier(args.out, num_worlds=args.worlds,
                           steps=args.steps, batch=args.batch,
                           image_size=args.image_size, seed=args.seed)


if __name__ == "__main__":
    main()
