"""Device mesh + sharding helpers.

One mechanism replaces the reference's three distribution stacks
(nn.DataParallel scatter/gather, vqvae2 NCCL DDP launcher
models/vqvae2/distributed/launch.py:21-91, and the sync_batchnorm pipe
protocol): a `jax.sharding.Mesh` with a data axis (and an optional model
axis for tensor-parallel layouts), batch leaves sharded over "data", and
parameters replicated.  Under pjit/GSPMD, gradient reduction, BatchNorm
statistics, and the VQ codebook EMA sums all lower to the same ICI
collectives automatically.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pixelsynth_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    assert dp * mp <= n, f"mesh {dp}x{mp} needs {dp*mp} devices, have {n}"
    dev = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(dev, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array leaf with its batch axis sharded over 'data'."""

    def place(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree.map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate parameters/state across the mesh."""
    sharding = NamedSharding(mesh, P())

    def place(x):
        return jax.device_put(jax.numpy.asarray(x), sharding)

    return jax.tree.map(place, tree)


def shard_batch_multihost(batch: Any, mesh: Mesh) -> Any:
    """Assemble a *global* batch from per-host shards on a multi-process
    mesh (pod slices: each host loads its own slice of the batch; the
    global array spans hosts without any cross-DCN copy of the data).

    Each leaf's leading axis is this host's local shard; the resulting
    global arrays have leading size local_size * process_count, sharded
    over the mesh's data axis.  On single-process setups this degrades to
    `shard_batch`.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, x.ndim), x
        )

    return jax.tree.map(place, batch)
