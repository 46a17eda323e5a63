"""ResNet-18 scene classifier (Places365) for sample re-ranking.

The reference loads torchvision resnet18(num_classes=365) with Places365
weights to score candidate outpaintings by prediction entropy
(models/z_buffermodel.py:88,254-261; demo.py:233-243).  This is the Flax
port; `load_torch_resnet18` converts a torchvision state_dict exported as
npz.  Without ported weights the entropy term of the ranking is
uninformative (the discriminator term still works) -- parity evals should
provide the converted weights.

Input: (B, 224, 224, 3) ImageNet-normalized NHWC.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def classifier_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """Entropy of classifier softmax per candidate (z_buffermodel.py:259-261)."""
    p = jax.nn.softmax(logits, axis=-1)
    return -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-12)), axis=-1)


def preprocess_for_classifier(img01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] image (B, H, W, 3) -> 224x224 ImageNet-normalized
    (the reference's torchvision transform, z_buffermodel.py:105-110)."""
    B = img01.shape[0]
    x = jax.image.resize(img01, (B, 224, 224, 3), method="bilinear")
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=self.stride,
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(h + x)


class ResNet18(nn.Module):
    num_classes: int = 365

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for feats, stride in [(64, 1), (64, 1), (128, 2), (128, 1),
                              (256, 2), (256, 1), (512, 2), (512, 1)]:
            h = BasicBlock(feats, stride)(h, train=train)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.num_classes)(h)


def load_torch_resnet18(npz_path: str) -> Dict:
    """Convert a torchvision resnet18 state_dict (exported as npz) into
    ResNet18 variables (params + batch_stats)."""
    raw = dict(np.load(npz_path).items())

    def conv(k):
        return jnp.asarray(raw[k].transpose(2, 3, 1, 0))

    def bn(prefix):
        return (
            {"scale": jnp.asarray(raw[f"{prefix}.weight"]),
             "bias": jnp.asarray(raw[f"{prefix}.bias"])},
            {"mean": jnp.asarray(raw[f"{prefix}.running_mean"]),
             "var": jnp.asarray(raw[f"{prefix}.running_var"])},
        )

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["Conv_0"] = {"kernel": conv("conv1.weight")}
    params["BatchNorm_0"], stats["BatchNorm_0"] = bn("bn1")

    block_idx = 0
    for layer in range(1, 5):
        for sub in range(2):
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            base = f"layer{layer}.{sub}"
            p["Conv_0"] = {"kernel": conv(f"{base}.conv1.weight")}
            p["BatchNorm_0"], s["BatchNorm_0"] = bn(f"{base}.bn1")
            p["Conv_1"] = {"kernel": conv(f"{base}.conv2.weight")}
            p["BatchNorm_1"], s["BatchNorm_1"] = bn(f"{base}.bn2")
            if f"{base}.downsample.0.weight" in raw:
                p["Conv_2"] = {"kernel": conv(f"{base}.downsample.0.weight")}
                p["BatchNorm_2"], s["BatchNorm_2"] = bn(f"{base}.downsample.1")
            params[f"BasicBlock_{block_idx}"] = p
            stats[f"BasicBlock_{block_idx}"] = s
            block_idx += 1

    params["Dense_0"] = {
        "kernel": jnp.asarray(raw["fc.weight"].T),
        "bias": jnp.asarray(raw["fc.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def classifier_num_classes(variables: Dict) -> int:
    """Class count carried by a ResNet18 variables tree (the final Dense
    kernel's output dim) -- lets SceneGenerator accept a classifier of any
    label space: Places365 (ported) or the in-repo panorama world
    classifier (tools/train_scene_classifier.py)."""
    return int(variables["params"]["Dense_0"]["kernel"].shape[-1])


def save_classifier_npz(path: str, variables: Dict) -> None:
    """Flatten ResNet18 variables into one npz (slash-joined keys)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", variables)
    np.savez_compressed(path, **flat)


def load_classifier_npz(path: str) -> Dict:
    """Inverse of save_classifier_npz."""
    out: Dict[str, Any] = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    return out
