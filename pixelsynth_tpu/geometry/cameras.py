"""Camera matrix utilities (pure JAX, batched).

Re-designs the reference's torch utilities as jittable batched functions:
  - invert_RT / invert_K / get_camera_matrices:
      geometry/camera_transformations.py:7-49
  - get_deltas (relative angle/translation between two extrinsics):
      utils/geometry.py:8-21
  - jitter_quaternions (rotation jitter for habitat sampling):
      utils/jitter.py:6-17
  - euler_to_rotation_matrix:
      models/z_buffermodel.py:186-200

All functions accept either a single matrix (no leading batch dim) or a
batch (leading dim B); rotation conventions match the reference exactly
(R_z @ R_y @ R_x Euler composition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def invert_RT(RT: jnp.ndarray) -> jnp.ndarray:
    """Invert an ([..., 3or4, 4]) extrinsic [R|t] matrix with orthonormal R.

    Mirrors geometry/camera_transformations.py:7-20.  If the input is 4x4 the
    output is 4x4 with bottom row [0,0,0,1].
    """
    R = RT[..., 0:3, 0:3]
    T = RT[..., 0:3, 3:4]
    Rinv = jnp.swapaxes(R, -1, -2)
    Tinv = -Rinv @ T
    top = jnp.concatenate([Rinv, Tinv], axis=-1)
    if RT.shape[-2] == 4:
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], RT.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)
    return top


def invert_K(K: jnp.ndarray) -> jnp.ndarray:
    """Invert an intrinsic matrix [[f 0 px],[0 f py],[0 0 1]] analytically.

    Mirrors geometry/camera_transformations.py:23-38; supports 3x3 or 4x4
    (habitat-style) K with arbitrary leading batch dims.
    """
    n = K.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), K.shape)
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    px = K[..., 0, 2]
    py = K[..., 1, 2]
    Kinv = eye
    Kinv = Kinv.at[..., 0, 0].set(1.0 / fx)
    Kinv = Kinv.at[..., 0, 2].set(-px / fx)
    Kinv = Kinv.at[..., 1, 1].set(1.0 / fy)
    Kinv = Kinv.at[..., 1, 2].set(-py / fy)
    return Kinv


def get_camera_matrices(position: jnp.ndarray, rotation: jnp.ndarray):
    """World-from-camera (Pinv) and camera-from-world (P) 4x4 matrices.

    Mirrors geometry/camera_transformations.py:41-49 but computes the inverse
    analytically from the orthonormal rotation rather than with a general
    matrix inverse.
    """
    position = jnp.asarray(position)
    rotation = jnp.asarray(rotation)
    batch = position.shape[:-1]
    Pinv = jnp.broadcast_to(jnp.eye(4, dtype=rotation.dtype), batch + (4, 4))
    Pinv = Pinv.at[..., 0:3, 0:3].set(rotation)
    Pinv = Pinv.at[..., 0:3, 3].set(position)
    P = invert_RT(Pinv)
    return P, Pinv


def euler_to_rotation_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """R = R_z @ R_y @ R_x for Euler angles theta=[..., 3].

    Mirrors models/z_buffermodel.py:186-200 exactly (same composition order).
    """
    theta = jnp.asarray(theta, jnp.float32)
    cx, sx = jnp.cos(theta[..., 0]), jnp.sin(theta[..., 0])
    cy, sy = jnp.cos(theta[..., 1]), jnp.sin(theta[..., 1])
    cz, sz = jnp.cos(theta[..., 2]), jnp.sin(theta[..., 2])
    zeros = jnp.zeros_like(cx)
    ones = jnp.ones_like(cx)
    Rx = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=-1
    ).reshape(theta.shape[:-1] + (3, 3))
    Ry = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=-1
    ).reshape(theta.shape[:-1] + (3, 3))
    Rz = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=-1
    ).reshape(theta.shape[:-1] + (3, 3))
    return Rz @ (Ry @ Rx)


def get_deltas(mat1: jnp.ndarray, mat2: jnp.ndarray):
    """(angular distance deg, translation norm) between two 4x4 extrinsics.

    Mirrors utils/geometry.py:8-21: dAngle from the trace of R1^T R2,
    dTrans = ||t2 - t1||.
    """
    R1, t1 = mat1[..., 0:3, 0:3], mat1[..., 0:3, 3]
    R2, t2 = mat2[..., 0:3, 0:3], mat2[..., 0:3, 3]
    rel = jnp.swapaxes(R1, -1, -2) @ R2
    tr = jnp.trace(rel, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    d_angle = jnp.degrees(jnp.arccos(cos))
    d_trans = jnp.linalg.norm(t2 - t1, axis=-1)
    return d_angle, d_trans


def jitter_quaternions(quat: jnp.ndarray, key: jax.Array, angle_deg: float = 10.0):
    """Perturb a (w,x,y,z) quaternion by a random rotation <= angle_deg.

    TPU-native analog of utils/jitter.py:6-17 (which uses scipy Rotation):
    sample a uniform axis and an angle in [-angle_deg/2, angle_deg/2] and
    compose.
    """
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    axis = axis / (jnp.linalg.norm(axis) + 1e-8)
    half = jnp.radians(jax.random.uniform(k2, (), minval=-angle_deg / 2, maxval=angle_deg / 2)) / 2
    dq = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])
    return _quat_mul(quat, dq)


def _quat_mul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )
