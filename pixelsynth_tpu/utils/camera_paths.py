"""Extra camera-path utilities.

Mirrors create_nerf_like_circles.py:6-14: a NeRF-style circular camera
sweep (look-at orbit) expressed as a list of 4x4 extrinsics, consumable by
pipeline.forward_angle / the scene generator."""

from __future__ import annotations

from typing import List

import numpy as np


def nerf_like_circle(
    n_frames: int = 30,
    radius: float = 0.35,
    depth_amp: float = 0.4,
) -> List[np.ndarray]:
    """Translation circle in the camera plane with a sinusoidal depth bob
    (the swirl geometry of z_buffermodel.py:211-216 as a standalone path).
    Returns n_frames 4x4 world-from-output extrinsics around identity."""
    out = []
    for i in range(n_frames):
        t = 2.0 * np.pi * i / n_frames
        M = np.eye(4, dtype=np.float32)
        M[:3, 3] = radius * np.array(
            [np.sin(t), np.cos(t), depth_amp * np.sin(t + np.pi / 2)],
            np.float32,
        )
        out.append(M)
    return out
