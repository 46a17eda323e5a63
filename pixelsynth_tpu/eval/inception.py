"""InceptionV3 pool3 feature extractor for FID (Flax, NHWC, eval-only).

The reference shells out to `python -m pytorch_fid`
(calc_errors_quality.py:135), which scores Frechet distance on InceptionV3
pool3 (2048-d) activations.  This is the Flax port of that network
(torchvision inception_v3 topology, aux head dropped); weights convert from
a torchvision/pytorch_fid state_dict exported as npz
(`load_torch_inception`).  Module names mirror the torch names so the
conversion is mechanical.

FID notes: pytorch_fid's "FIDInception" blocks differ from stock
torchvision only in pooling details (avg-pool count_include_pad=False —
which is what `nn.avg_pool` does for interior windows with explicit
padding here — and a max-pool in the last E block); `fid_variant=True`
reproduces them.

Input: (B, 299, 299, 3) in [-1, 1] (use `preprocess_for_inception`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def preprocess_for_inception(img01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] NHWC -> 299x299 in [-1,1] (pytorch_fid's resize + scaling)."""
    B = img01.shape[0]
    x = jax.image.resize(img01, (B, 299, 299, 3), method="bilinear")
    return x * 2.0 - 1.0


class BasicConv(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _avg3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


def _max3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, (1, 1), name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max3s2(x)], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"   # pytorch_fid's last E block uses max pool

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "max":
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
        else:
            pooled = _avg3(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """-> (B, 2048) pool3 activations."""

    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max3s2(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max" if self.fid_variant else "avg", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))


def load_torch_inception(npz_path: str) -> Dict:
    """Convert a torchvision/pytorch_fid inception state_dict (exported as
    npz) into InceptionV3Features variables."""
    raw = np.load(npz_path)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    for key in raw.files:
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-2] + ["conv", "kernel"],
                raw[key].transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            name = parts[-1]
            if name == "weight":
                put(params, parts[:-1] + ["scale"], raw[key])
            elif name == "bias":
                put(params, parts[:-1] + ["bias"], raw[key])
            elif name == "running_mean":
                put(stats, parts[:-1] + ["mean"], raw[key])
            elif name == "running_var":
                put(stats, parts[:-1] + ["var"], raw[key])
    return {"params": params, "batch_stats": stats}


def make_fid_feature_fn(variables=None, key=None, batch: int = 16):
    """Feature function for eval.calc_errors.calc_errors_quality: images
    [0,1] -> (B, 2048) activations.  Random-weight fallback when no
    converted checkpoint is supplied (smoke only)."""
    net = InceptionV3Features()
    if variables is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        variables = net.init({"params": key}, jnp.zeros((1, 299, 299, 3)))

    @jax.jit
    def fn(img01):
        return net.apply(variables, preprocess_for_inception(img01))

    return fn
