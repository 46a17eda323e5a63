"""Fused camera reprojection: depth map -> point cloud in a novel view.

Single jitted op replacing the reference's chain of bmm's and sign flips
(models/projection/z_buffer_manipulator.py:50-83 project_pts +
models/layers/z_buffer_layers.py:71-72 negation): unproject pixels by
predicted depth through K^-1, transform cam1 -> cam2, project through K, and
emit **continuous pixel coordinates** (col, row) plus view depth, ready for
the splatter.

Derivation of the convention (verified against the reference end-to-end):
the reference builds an NDC grid xyzs=(x_s,-y_s,-1,1) with
x_s=2c/(W-1)-1, y_s=2r/(W-1)-1 (z_buffer_manipulator.py:38-48), and after
project_pts + the splatter's xy negation feeds PyTorch3D points
  x_pt3d = h_x / h_z,  y_pt3d = -h_y / h_z,  depth = -h_z
where h = K @ RT2 @ RT1inv @ Kinv @ (grid * depth).  PyTorch3D NDC has
(+1,+1) at the top-left, so pixel coordinates are
  col = (1 - x_pt3d) * (W-1)/2,  row = (1 - y_pt3d) * (W-1)/2.
For the identity transform this maps pixel (r, c) exactly back to (r, c).

Cumulative scenes: the reference carries the **K-projected homogeneous
cloud** h = xy_proj of each rendered view forward and re-transforms it with
relative extrinsics only (z_buffer_manipulator.py:221-266; note K is merged
into P for RealEstate10K, data/realestate10k.py:59-77, so this is exact
there).  `project_points` returns that cloud; `reproject_cloud` projects a
carried cloud into a new camera.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

EPS = 1e-2  # matches z_buffer_manipulator.py:8


@functools.lru_cache(maxsize=8)
def _ndc_grid_np(W: int, H: int):
    import numpy as np

    xs = (np.arange(W, dtype=np.float32) / (W - 1)) * 2.0 - 1.0
    ys = (np.arange(H, dtype=np.float32) / (H - 1)) * 2.0 - 1.0
    gx = np.tile(xs[None, :], (H, 1)).reshape(-1)
    gy = np.tile(ys[:, None], (1, W)).reshape(-1)
    grid = np.stack([gx, -gy, -np.ones_like(gx), np.ones_like(gx)], axis=0)
    return grid  # (4, H*W)


def ndc_grid(W: int, H: int | None = None) -> jnp.ndarray:
    """(4, H*W) homogeneous grid matching z_buffer_manipulator.py:38-48."""
    H = W if H is None else H
    return jnp.asarray(_ndc_grid_np(W, H))


def _to44(M: jnp.ndarray) -> jnp.ndarray:
    """Promote [...,3,3] / [...,3,4] to [...,4,4]."""
    if M.shape[-2:] == (4, 4):
        return M
    batch = M.shape[:-2]
    out = jnp.broadcast_to(jnp.eye(4, dtype=M.dtype), batch + (4, 4))
    out = out.at[..., : M.shape[-2], : M.shape[-1]].set(M)
    return out


def homogeneous_to_pixels(h: jnp.ndarray, W: int):
    """Homogeneous clip points (B, 4, N) -> ((B,N,3) [col,row,depth], valid).

    Invalid points (|h_z| < EPS, reference z clamp at
    z_buffer_manipulator.py:70-77) are pushed far off-screen with huge depth
    so the splatter ignores them.
    """
    hz = h[:, 2, :]
    valid = jnp.abs(hz) >= EPS
    hz_safe = jnp.where(valid, hz, EPS)
    x_pt = h[:, 0, :] / hz_safe
    y_pt = -h[:, 1, :] / hz_safe
    depth = -hz
    col = (1.0 - x_pt) * (W - 1) / 2.0
    row = (1.0 - y_pt) * (W - 1) / 2.0
    big = jnp.float32(-1e6)
    col = jnp.where(valid, col, big)
    row = jnp.where(valid, row, big)
    depth = jnp.where(valid, depth, jnp.float32(1e6))
    return jnp.stack([col, row, depth], axis=-1), valid


def lift_to_cloud(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
    RTinv_cam1: jnp.ndarray,
    RT_cam2: jnp.ndarray,
    W: int,
) -> jnp.ndarray:
    """Depth map -> K-projected homogeneous cloud in the cam2 frame.

    h = K @ RT_cam2 @ RTinv_cam1 @ Kinv @ (grid * depth)  -- the reference's
    xy_proj (z_buffer_manipulator.py:59-67); (B, 4, N), last row 1.
    """
    B = depth.shape[0]
    d = depth.reshape(B, 1, -1)
    grid = ndc_grid(W, W)[None]
    coors = grid * d
    coors = coors.at[:, 3, :].set(1.0)
    RT = _to44(RT_cam2) @ _to44(RTinv_cam1)
    return _to44(K) @ (RT @ (_to44(K_inv) @ coors))


def project_points(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
    RT_cam1: jnp.ndarray,
    RTinv_cam1: jnp.ndarray,
    RT_cam2: jnp.ndarray,
    RTinv_cam2: jnp.ndarray = None,
    *,
    W: int,
):
    """Fused projection of view-1 pixels into view-2 pixel space.

    Args:
      depth: (B, H, W) / (B, 1, H, W) / (B, N) predicted depth for view 1.
      K, K_inv, RT_*: batched camera matrices (3x3/3x4/4x4).
    Returns:
      (points, valid, cloud): points (B, N, 3) as (col, row, view-depth) in
      pixel units of the WxW target image; valid (B, N) bool; cloud (B, 4, N)
      homogeneous points to carry for cumulative scenes.
    """
    del RT_cam1, RTinv_cam2
    cloud = lift_to_cloud(depth, K, K_inv, RTinv_cam1, RT_cam2, W)
    pts, valid = homogeneous_to_pixels(cloud, W)
    return pts, valid, cloud


def reproject_cloud(
    cloud: jnp.ndarray,
    K: jnp.ndarray,
    RT_cam2: jnp.ndarray,
    RTinv_cam3: jnp.ndarray,
    W: int,
):
    """Project a carried cloud (B, 4, N), produced in the view whose inverse
    extrinsic is RTinv_cam3, into camera-2 pixel space.

    Mirrors z_buffer_manipulator.py:244-247: h = K @ (RT2 @ RTinv3) @ cloud.
    """
    RT = _to44(RT_cam2) @ _to44(RTinv_cam3)
    h = _to44(K) @ (RT @ cloud)
    return homogeneous_to_pixels(h, W)
