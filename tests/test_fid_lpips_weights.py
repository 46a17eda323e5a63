"""FID/LPIPS weight-conversion mechanics + FID machinery sanity.

The trained FID-Inception / LPIPS weights can only be exported in an
environment with network access (tools/export_torch_weights.py); here we
verify the conversion *mechanics* round-trip -- a torch-layout npz built
from a flax tree loads back into the identical tree -- and that the FID
pipeline scores identical image sets at ~0 (true for any feature net,
trained or not; reference protocol: calc_errors_quality.py:135)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelsynth_tpu.eval.inception import (
    InceptionV3Features,
    load_torch_inception,
    make_fid_feature_fn,
)
from pixelsynth_tpu.eval.metrics import (
    feature_stats,
    fid_from_stats,
    load_lpips_lin_weights,
)


def _flax_to_torch_npz(variables, path):
    """Invert load_torch_inception's mapping: flax tree -> torch-key npz."""
    out = {}

    def walk(node, prefix, collection):
        for k, v in node.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p, collection)
                continue
            arr = np.asarray(v)
            if collection == "params":
                if p.endswith("conv.kernel"):
                    out[p[: -len("kernel")] + "weight"] = arr.transpose(3, 2, 0, 1)
                elif p.endswith("bn.scale"):
                    out[p[: -len("scale")] + "weight"] = arr
                elif p.endswith("bn.bias"):
                    out[p] = arr
            else:
                if p.endswith("bn.mean"):
                    out[p[: -len("mean")] + "running_mean"] = arr
                elif p.endswith("bn.var"):
                    out[p[: -len("var")] + "running_var"] = arr

    walk(variables["params"], "", "params")
    walk(variables["batch_stats"], "", "batch_stats")
    np.savez(path, **out)
    return out


def test_inception_conversion_roundtrip(tmp_path):
    net = InceptionV3Features()
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 299, 299, 3)))
    path = os.path.join(str(tmp_path), "inception_fid.npz")
    _flax_to_torch_npz(variables, path)
    loaded = load_torch_inception(path)

    flat_orig = jax.tree_util.tree_leaves_with_path(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]})
    flat_load = dict(jax.tree_util.tree_leaves_with_path(loaded))
    # batch-norm scale/bias/mean/var + conv kernels all survive the trip
    n_checked = 0
    for path_k, leaf in flat_orig:
        assert path_k in flat_load, f"missing {jax.tree_util.keystr(path_k)}"
        np.testing.assert_allclose(np.asarray(flat_load[path_k]),
                                   np.asarray(leaf), atol=1e-6)
        n_checked += 1
    assert n_checked > 250  # the full 94-conv inception tree

    # converted weights actually run
    out = net.apply(loaded, jnp.zeros((1, 299, 299, 3)))
    assert out.shape == (1, 2048)


def test_lpips_lin_loader(tmp_path):
    rng = np.random.RandomState(0)
    chans = [64, 128, 256, 512, 512]
    raw = {f"lin{i}.model.1.weight": rng.rand(1, c, 1, 1).astype(np.float32)
           for i, c in enumerate(chans)}
    path = os.path.join(str(tmp_path), "lpips.npz")
    np.savez(path, **raw)
    lins = load_lpips_lin_weights(path)
    assert [l.shape[0] for l in lins] == chans
    np.testing.assert_allclose(lins[2], raw["lin2.model.1.weight"].reshape(-1))
    # lpips-package naming variant
    raw2 = {f"lins.{i}.model.1.weight": v for i, v in
            zip(range(5), raw.values())}
    path2 = os.path.join(str(tmp_path), "lpips2.npz")
    np.savez(path2, **raw2)
    lins2 = load_lpips_lin_weights(path2)
    assert [l.shape[0] for l in lins2] == chans


def test_fid_identical_sets_is_zero():
    fn = make_fid_feature_fn(key=jax.random.PRNGKey(1))
    imgs = jnp.asarray(
        np.random.RandomState(2).rand(12, 64, 64, 3).astype(np.float32))
    feats = np.asarray(fn(imgs))
    mu, sigma = feature_stats(feats)
    fid = fid_from_stats(mu, sigma, mu.copy(), sigma.copy())
    assert abs(fid) < 1e-3
    # and a genuinely different set scores > 0
    feats2 = np.asarray(fn(jnp.asarray(
        np.random.RandomState(3).rand(12, 64, 64, 3).astype(np.float32) * 0.2)))
    mu2, sigma2 = feature_stats(feats2)
    # random-init features are tiny, so the absolute scale is small --
    # the separation from the self-distance (~1e-14) is what matters
    fid_diff = fid_from_stats(mu, sigma, mu2, sigma2)
    assert fid_diff > 1e3 * max(abs(fid), 1e-12)
