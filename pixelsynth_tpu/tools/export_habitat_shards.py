"""Export habitat-sim episode pairs to the .npz shard format consumed by
pixelsynth_tpu.data.habitat.PreRenderedEpisodes.

The reference renders MP3D/Replica training pairs *on the fly* from
habitat-sim behind 5 VectorEnv worker processes
(data/create_rgb_dataset.py:90-439).  The TPU-native pipeline instead
pre-renders shards on any machine with habitat installed and streams them
from disk, which decouples the C++ simulator from the accelerator input
pipeline entirely.

Sampling semantics mirror RandomImageGenerator.get_vector_sample
(create_rgb_dataset.py:231-333):
  * a random navigable point per episode with a uniform random yaw;
  * the second view at the same position with the quaternion jittered by
    <= max_rotation degrees per Euler axis (utils/jitter.py:6-17) -- the
    "outpaint" image_type used by PixelSynth;
  * K from the sensor HFOV: diag(1/tan(hfov/2), 1/tan(hfov/2), 1, 1)
    (create_rgb_dataset.py:204-216);
  * world-to-camera P / Pinv from the agent state
    (get_camera_matrices, geometry/camera_transformations.py:41-49).

Shard layout (see data/habitat.py):
  images (N, 2, W, W, 3) uint8;  P, Pinv (N, 2, 4, 4) float32;
  K, Kinv (4, 4) float32.

Usage (in a habitat env):
  python -m pixelsynth_tpu.tools.export_habitat_shards \
      --scenes-config <habitat_cfg> --out shards/ --num-pairs 40000

Without habitat installed, `--synthetic N` writes procedurally rendered
shards (textured planes under the same camera model) so the downstream
training path can be exercised end to end; tests/test_habitat_shards.py
builds its fixture this way.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np


def hfov_intrinsics(hfov_deg: float = 90.0) -> np.ndarray:
    """K = diag(1/tan(hfov/2), 1/tan(hfov/2), 1, 1)
    (create_rgb_dataset.py:204-216)."""
    f = 1.0 / np.tan(np.radians(hfov_deg) / 2.0)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = f
    return K


def _euler_jitter(rng: np.random.Generator, max_rotation: float) -> np.ndarray:
    """Per-axis uniform Euler jitter in radians (utils/jitter.py:10-14)."""
    return (rng.random(3) - 0.5) * np.pi * max_rotation / 180.0


def _rot_xyz(e: np.ndarray) -> np.ndarray:
    cx, cy, cz = np.cos(e)
    sx, sy, sz = np.sin(e)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def camera_matrices(position: np.ndarray, rotation: np.ndarray):
    """World-to-camera P and its inverse from an agent state, mirroring
    geometry/camera_transformations.py:41-49 (y-flip convention)."""
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = rotation.T
    P[:3, 3] = -rotation.T @ position
    # habitat's camera looks down -z with +y up; flip to the model's frame
    F = np.diag(np.array([1, -1, -1, 1], np.float32))
    P = F @ P
    return P, np.linalg.inv(P).astype(np.float32)


# ---------------------------------------------------------------------------
# synthetic renderer (no habitat): textured fronto-parallel planes
# ---------------------------------------------------------------------------


def _render_plane_scene(rng: np.random.Generator, W: int, K: np.ndarray,
                        P: np.ndarray, texture: np.ndarray,
                        depth: float) -> np.ndarray:
    """Project a world-space textured plane at z=depth into the camera
    described by P -- enough parallax/rotation structure to exercise the
    depth + reprojection training path on shard data."""
    ys, xs = np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, W),
                         indexing="ij")
    ones = np.ones_like(xs)
    # rays through pixel grid at the plane depth (camera frame of identity)
    pts = np.stack([xs * depth, ys * depth, ones * depth, ones], 0)  # (4,W,W)
    world = np.linalg.inv(P) @ pts.reshape(4, -1)
    # sample the texture by world x,y (wrapping)
    T = texture.shape[0]
    u = ((world[0] * 0.25 + 0.5) % 1.0 * (T - 1)).astype(int)
    v = ((world[1] * 0.25 + 0.5) % 1.0 * (T - 1)).astype(int)
    img = texture[v, u].reshape(W, W, 3)
    return img


def synthesize_shard(rng: np.random.Generator, n: int, W: int,
                     max_rotation: float) -> Dict[str, np.ndarray]:
    K = hfov_intrinsics(90.0)
    Kinv = np.linalg.inv(K).astype(np.float32)
    images = np.zeros((n, 2, W, W, 3), np.uint8)
    Ps = np.zeros((n, 2, 4, 4), np.float32)
    Pinvs = np.zeros((n, 2, 4, 4), np.float32)
    for i in range(n):
        texture = rng.integers(0, 255, (64, 64, 3), np.uint8)
        position = rng.uniform(-1, 1, 3)
        yaw = rng.uniform(0, 2 * np.pi)
        R0 = _rot_xyz(np.array([0.0, yaw, 0.0]))
        R1 = R0 @ _rot_xyz(_euler_jitter(rng, max_rotation))
        depth = rng.uniform(2.0, 4.0)
        for v, R in enumerate((R0, R1)):
            P, Pinv = camera_matrices(position, R)
            images[i, v] = _render_plane_scene(rng, W, K, P, texture, depth)
            Ps[i, v], Pinvs[i, v] = P, Pinv
    return {"images": images, "P": Ps, "Pinv": Pinvs, "K": K, "Kinv": Kinv}


# ---------------------------------------------------------------------------
# habitat-sim exporter (+ the pieces the live bridge reuses,
# data/habitat_bridge.HabitatLivePairGenerator)
# ---------------------------------------------------------------------------


def make_habitat_env(scenes_config: str):
    """-> (habitat.Env, K).  Lazy habitat import: callable from exporter
    and from bridge worker processes alike."""
    try:
        import habitat  # noqa: F401
        import quaternion  # noqa: F401
    except ImportError as e:  # pragma: no cover - habitat not in CI image
        raise SystemExit(
            f"habitat-sim/habitat-lab not installed ({e}); run this in a "
            "habitat environment, or use --synthetic for fixture shards"
        )
    import habitat

    config = habitat.get_config(scenes_config)
    env = habitat.Env(config=config)
    K = hfov_intrinsics(config.SIMULATOR.DEPTH_SENSOR.HFOV)
    return env, K


def render_habitat_pair(env, rng: np.random.Generator,
                        max_rotation: float):  # pragma: no cover - live sim
    """One (input, output) view pair at a random navigable point: uniform
    yaw start, Euler-jittered second rotation (create_rgb_dataset.py:
    231-333, utils/jitter.py:6-17).  Returns (images (2,W,W,3) uint8,
    P (2,4,4), Pinv (2,4,4))."""
    import quaternion

    pos = np.array(env.sim.sample_navigable_point())
    yaw = rng.uniform(0, 2 * np.pi)
    rot0 = [0, np.sin(yaw / 2), 0, np.cos(yaw / 2)]
    views = [rot0]
    q = quaternion.from_float_array(rot0)
    e = quaternion.as_euler_angles(q) + _euler_jitter(rng, max_rotation)
    views.append(quaternion.as_float_array(
        quaternion.from_euler_angles(e)).tolist())
    images, Ps, Pinvs = [], [], []
    for rot in views:
        obs = env.sim.get_observations_at(position=pos, rotation=rot)
        images.append(obs["rgb"][..., :3])
        st = env.sim.get_agent_state()
        R = quaternion.as_rotation_matrix(st.rotation)
        P, Pinv = camera_matrices(np.array(st.position), R)
        Ps.append(P)
        Pinvs.append(Pinv)
    return np.stack(images), np.stack(Ps), np.stack(Pinvs)


def export_habitat(out_dir: str, *, scenes_config: str, num_pairs: int,
                   shard_size: int, W: int, max_rotation: float,
                   seed: int, split: str) -> int:
    """Render pairs from habitat (requires habitat-sim + habitat-lab).

    Episode handling matches the reference: one episode per scene fixture,
    env reset every images_before_reset samples
    (create_rgb_dataset.py:122-148,232-234)."""
    env, K = make_habitat_env(scenes_config)
    # pragma: no cover start -- executes only with a live simulator
    rng = np.random.default_rng(seed)
    Kinv = np.linalg.inv(K).astype(np.float32)
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    shard_idx = 0
    while written < num_pairs:
        n = min(shard_size, num_pairs - written)
        images = np.zeros((n, 2, W, W, 3), np.uint8)
        Ps = np.zeros((n, 2, 4, 4), np.float32)
        Pinvs = np.zeros((n, 2, 4, 4), np.float32)
        for i in range(n):
            if (written + i) % 100 == 0:
                env.reset()
            images[i], Ps[i], Pinvs[i] = render_habitat_pair(
                env, rng, max_rotation)
        np.savez(
            os.path.join(out_dir, f"{split}_{shard_idx:05d}.npz"),
            images=images, P=Ps, Pinv=Pinvs, K=K, Kinv=Kinv,
        )
        written += n
        shard_idx += 1
    return shard_idx
    # pragma: no cover end


def export_synthetic(out_dir: str, *, num_pairs: int, shard_size: int,
                     W: int, max_rotation: float, seed: int,
                     split: str, world: str = "plane") -> int:
    """world="plane": round-1 textured-plane fixtures; world="pano":
    closed panorama worlds with exact geometry + GT depth
    (data/panorama.py) -- the navigable fixture the end-to-end relay
    trains and demos on."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    shard_idx = 0
    while written < num_pairs:
        n = min(shard_size, num_pairs - written)
        if world == "pano":
            from pixelsynth_tpu.data.panorama import synthesize_pano_shard

            shard = synthesize_pano_shard(rng, n, W, max_rotation)
        else:
            shard = synthesize_shard(rng, n, W, max_rotation)
        np.savez(os.path.join(out_dir, f"{split}_{shard_idx:05d}.npz"), **shard)
        written += n
        shard_idx += 1
    return shard_idx


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--scenes-config", default=None,
                   help="habitat config yaml (MP3D/Replica)")
    p.add_argument("--num-pairs", type=int, default=40000)
    p.add_argument("--shard-size", type=int, default=512)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--max-rotation", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--split", default="train")
    p.add_argument("--synthetic", action="store_true",
                   help="write procedurally rendered shards (no habitat)")
    p.add_argument("--world", default="plane", choices=["plane", "pano"],
                   help="synthetic world type (pano = navigable panorama "
                        "worlds with GT depth, data/panorama.py)")
    args = p.parse_args(argv)
    kw = dict(num_pairs=args.num_pairs, shard_size=args.shard_size,
              W=args.width, max_rotation=args.max_rotation, seed=args.seed,
              split=args.split)
    if args.synthetic:
        n = export_synthetic(args.out, world=args.world, **kw)
    else:
        if not args.scenes_config:
            raise SystemExit("--scenes-config required without --synthetic")
        n = export_habitat(args.out, scenes_config=args.scenes_config, **kw)
    print(f"wrote {n} shard(s) to {args.out}")


if __name__ == "__main__":
    main()
