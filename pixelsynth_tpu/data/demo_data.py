"""Demo-image loading + habitat-convention cameras.

Mirrors demo.py:27-98 (process_demo_data): resize to WxW, normalize to
[-1,1]; identity extrinsics; intrinsics with centered principal point merged
habitat-style (offset @ K folded into P, so the model-facing K is identity).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# Flip ys and negate z to match habitat (demo.py:36-39)
OFFSET = np.array(
    [[2, 0, -1], [0, -2, 1], [0, 0, -1]], dtype=np.float32
)


def demo_cameras(aspect_ratio: float = 1.0) -> Dict[str, np.ndarray]:
    """Identity-extrinsic camera dict with habitat-merged intrinsics."""
    intr = np.array([1.0, 1.0 * aspect_ratio, 0.5, 0.5], np.float32)
    origK = np.array(
        [[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]], np.float32
    )
    Ktmp = OFFSET @ origK
    origP = np.array(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]], np.float32
    )
    P = np.vstack([Ktmp @ origP, np.zeros((1, 4), np.float32)])
    P[3, 3] = 1
    Pinv = np.linalg.inv(P)
    I4 = np.eye(4, dtype=np.float32)
    return {
        "K": I4[None],
        "Kinv": I4[None],
        "P": P[None].astype(np.float32),
        "Pinv": Pinv[None].astype(np.float32),
    }


def load_demo_image(path: str, W: int = 256) -> Tuple[np.ndarray, float]:
    """Load a PNG/JPG -> ((1, W, W, 3) float32 in [-1,1], aspect ratio)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    ratio = img.size[0] / img.size[1]
    img = img.resize((W, W), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr * 2.0 - 1.0)[None], ratio
