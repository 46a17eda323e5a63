"""utils/devices.py: variable trees are committed to device exactly once.

Round 4 regression guard: init_variables/load_stitched_npz used to return
host-committed trees, and JAX re-transfers host-resident jit arguments on
EVERY call -- through the remote TPU tunnel that upload WAS the view time
(evidence/profile_view_r4.json: depth U-Net 1,028 ms/forward for 27 ms of
compute).  put_variables must return trees whose leaves are committed to
the accelerator (or replicated over a mesh) so jit calls only move
activations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.utils.devices import put_variables


def _tree():
    return {
        "params": {"w": np.ones((4, 4), np.float32), "b": np.zeros(4)},
        "batch_stats": {"mean": jnp.zeros(4)},  # uncommitted jnp leaf
    }


def test_put_variables_commits_to_default_device():
    out = put_variables(_tree())
    dev = jax.devices()[0]
    for leaf in jax.tree_util.tree_leaves(out):
        assert isinstance(leaf, jax.Array)
        assert leaf.committed, "leaf left uncommitted: jit would re-upload"
        assert leaf.devices() == {dev}


def test_put_variables_none_passthrough():
    assert put_variables(None) is None


def test_put_variables_replicates_over_mesh():
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("data",))
    out = put_variables(_tree(), mesh=mesh)
    for leaf in jax.tree_util.tree_leaves(out):
        assert leaf.committed
        # fully replicated: every mesh device holds the whole leaf
        assert leaf.devices() == set(devs.tolist())
        assert leaf.sharding.is_fully_replicated


def test_put_variables_values_unchanged():
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    out = put_variables(tree)
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
