"""In-repo scene classifier for candidate re-ranking (the Places365 role,
z_buffermodel.py:244-276, trained on panorama worlds --
tools/train_scene_classifier.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pixelsynth_tpu.models.classifier import (
    ResNet18,
    classifier_num_classes,
    load_classifier_npz,
)
from pixelsynth_tpu.tools.train_scene_classifier import train_scene_classifier


@pytest.mark.slow
def test_train_save_load_and_entropy(tmp_path):
    # tiny but real: 3 worlds, low res -- must beat chance comfortably
    out = train_scene_classifier(
        str(tmp_path), num_worlds=3, steps=60, batch=8, image_size=48,
        seed=1, eval_batches=3)
    assert out["val_accuracy"] > 0.6, out  # chance = 0.33

    variables = load_classifier_npz(out["path"])
    assert classifier_num_classes(variables) == 3

    # the ranking path: confident (trained-world) images must score lower
    # entropy than noise
    from pixelsynth_tpu.data.panorama import make_world, render_view, \
        sample_pair_cameras
    from pixelsynth_tpu.models.classifier import IMAGENET_MEAN, IMAGENET_STD
    from pixelsynth_tpu.sampling import classifier_entropy

    rng = np.random.default_rng(1)
    worlds = [make_world(rng) for _ in range(3)]
    P0, _ = sample_pair_cameras(rng)
    img, _ = render_view(worlds[0], P0, 48)
    noise = rng.uniform(-1, 1, img.shape).astype(np.float32)
    model = ResNet18(num_classes=3)

    def ent(x):
        x01 = jnp.asarray(x[None]) * 0.5 + 0.5
        x_n = (x01 - IMAGENET_MEAN) / IMAGENET_STD
        logits = model.apply(variables, x_n, train=False)
        return float(classifier_entropy(logits)[0])

    assert ent(img) < ent(noise)
