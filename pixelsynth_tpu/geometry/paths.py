"""Camera-path construction for scene generation.

Re-implements the reference's rotation-vector table and interpolated camera
paths (models/z_buffermodel.py:112-118, 202-242) as pure, jittable functions:

  - 8 rotation directions (R L U D UL UR DR DL) interpolated as
    ``rotvec * num / denom``
  - swirl path 'S' (translation circle, z_buffermodel.py:211-216)
  - circle path 'C' (rotation circle, z_buffermodel.py:217-225)
  - fixed-rotation mode for paired-image settings (z_buffermodel.py:229)
  - homography mode (rotation about the camera center, z_buffermodel.py:235-238)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.geometry.cameras import euler_to_rotation_matrix

# Full-angle rotation vectors; mirrors models/z_buffermodel.py:114-115.
ROTVECS = {
    "R": np.array([0.0, 0.6, 0.0]),
    "L": np.array([0.0, -0.6, 0.0]),
    "U": np.array([-0.3, 0.0, 0.0]),
    "D": np.array([0.3, 0.0, 0.0]),
    "UR": np.array([-0.15, 0.3, 0.0]),
    "UL": np.array([-0.15, -0.3, 0.0]),
    "DR": np.array([0.15, 0.3, 0.0]),
    "DL": np.array([0.15, -0.3, 0.0]),
}

# Consistency-direction index mapping; mirrors models/z_buffermodel.py:118.
DIRECTION_ORDER = ["R", "L", "U", "D", "UL", "UR", "DR", "DL"]


def _rt_from_rotvec(rotvec: jnp.ndarray, input_RT: jnp.ndarray, homography: bool):
    """4x4 output extrinsic from an euler rotvec applied before input_RT."""
    R = euler_to_rotation_matrix(rotvec)
    mtx = jnp.zeros((4, 4), jnp.float32).at[3, 3].set(1.0).at[:3, :3].set(R)
    if homography:
        # rotate about the camera centre, keep translation column
        out = jnp.zeros((4, 4), jnp.float32)
        out = out.at[:, 3].set(input_RT[..., :, 3])
        out = out.at[:3, :3].set(mtx[:3, :3] @ input_RT[..., :3, :3])
    else:
        out = mtx @ input_RT
    return out


def get_rt_from_rot(
    direction: str,
    input_RT: jnp.ndarray,
    num: float | None = None,
    denom: float | None = None,
    *,
    scene_mode: bool = True,
    rotation: float = 0.3,
    homography: bool = False,
):
    """Interpolated output camera for a path direction.

    Mirrors models/z_buffermodel.py:202-242.  Returns (output_RTinv,
    output_RT), both 4x4 (or batched matching input_RT).

    scene_mode=True corresponds to model_setting in {gen_scene, gen_two_imgs}
    (interpolated rotvec * num/denom); scene_mode=False is the fixed-rotation
    gen_img path, scaling the direction to total magnitude ``rotation``.
    """
    input_RT = jnp.asarray(input_RT, jnp.float32)
    if num is None:
        num = 0.0
    squeeze = input_RT.ndim == 2

    def fin(out_RT):
        out_RT = out_RT if squeeze else jnp.broadcast_to(out_RT, input_RT.shape)
        # EXACT inverse, matching the reference's torch.inverse
        # (z_buffermodel.py:215,224,241).  NOT invert_RT: demo/habitat
        # extrinsics carry the habitat OFFSET@K fold (demo.py:36-39), so
        # out_RT[:3,:3] = R_euler @ diag(2,-2,-1) is NOT orthonormal and the
        # transpose shortcut returns an inverse wrong by diag(4,4,1).  In a
        # cumulative scene walk that error compounds per view hop: every
        # carried-cloud reprojection zoomed x4 in x/y, collapsing the cloud
        # to an ever-sparser dot grid (measured 16384 -> 1024 -> 64 -> 4
        # on-screen points after 1/2/3 hops -- the round-5 scene-walk-drift
        # root cause, evidence/scene_drift_r5.json).
        return jnp.linalg.inv(out_RT), out_RT

    RT0 = input_RT if squeeze else input_RT[0]

    if scene_mode and direction == "S":
        # swirl: translate on a tilted circle, keep rotation
        # (z_buffermodel.py:211-216)
        t = 2.0 * np.pi * num / denom
        offs = 0.35 * jnp.array(
            [np.sin(t), np.cos(t), 0.4 * np.sin(2.0 * np.pi * (0.25 + num / denom))],
            jnp.float32,
        )
        out = jnp.zeros((4, 4), jnp.float32)
        out = out.at[:, :3].set(RT0[:, :3])
        out = out.at[3, 3].set(1.0)
        out = out.at[:3, 3].set(RT0[:3, 3] + offs)
        return fin(out)
    if scene_mode and direction == "C":
        # circle: rotate viewing direction on a small cone
        # (z_buffermodel.py:217-225)
        t = 2.0 * np.pi * num / denom
        rotvec = jnp.array([0.2 * np.cos(t), 0.2 * np.sin(t), 0.0], jnp.float32)
        return fin(_rt_from_rotvec(rotvec, RT0, homography=False))

    base = ROTVECS[direction]
    if scene_mode:
        rotvec = jnp.asarray(base * float(num) / float(denom), jnp.float32)
    else:
        rotvec = jnp.asarray(base * rotation / np.linalg.norm(base), jnp.float32)
    return fin(_rt_from_rotvec(rotvec, RT0, homography=homography))


def num_split_for_direction(direction: str, num_split: int, two_imgs: bool = False) -> int:
    """Per-direction split count (models/z_buffermodel.py:452-458)."""
    if two_imgs:
        return 2
    if direction in ("S", "C"):
        return num_split * 2
    if direction in ("U", "D", "UL", "UR", "DR", "DL"):
        return max(int(num_split / 2), 1)
    return num_split
