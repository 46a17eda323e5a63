"""Device placement for variable trees.

JAX does NOT lazily cache host arrays on the accelerator: a numpy- or
CPU-backed tree passed to a jitted function is re-transferred on EVERY
call.  Through the remote axon tunnel that transfer is the whole cost --
round 3's "1,028 ms depth U-Net forward" was ~40 MB of f32 weights
re-uploaded per call around a ~24 ms compute kernel (see
tools/profile_hotspots.py, evidence/profile_hotspots_r4.json).

`put_variables` commits a tree to the default device once (or replicates
it across a mesh) so steady-state steps only move activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def put_variables(tree, mesh=None):
    """Commit every leaf of ``tree`` to device.

    mesh: optional jax.sharding.Mesh -- leaves are then replicated across
    the whole mesh (weights are small; the population/batch axes carry the
    sharding).  Without a mesh, leaves go to the default device.
    """
    if tree is None:
        return None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), tree
        )
    # device_put with device=None is a NO-OP for arrays already committed
    # to some device -- init_variables commits its output to the CPU
    # backend, so the accelerator must be named explicitly
    dev = jax.devices()[0]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), dev), tree
    )
