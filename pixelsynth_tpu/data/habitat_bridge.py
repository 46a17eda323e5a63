"""Live simulator bridge: worker processes rendering training pairs on the
fly, feeding the host-side input pipeline.

The reference drives habitat-sim from 5 worker processes behind a patched
VectorEnv's command pipes (utils/custom_habitat_vector_env.py:134-214,
RPCs get_observations_at / sample_navigable_point / get_agent_state at
327-347), wrapped by RandomImageGenerator (data/create_rgb_dataset.py:
90-439) into a torch Dataset.  The TPU-native treatment keeps the
simulator an external host-side source (SURVEY.md section 2.1): the
bridge here is a bounded producer queue over N worker processes, each
owning a private generator built from a picklable factory -- the same
shape as the reference's env fan-out, minus the per-call RPC round trip
(workers free-run; the device never blocks on the simulator when the
bridge is wrapped in data.prefetch).

The worker body is simulator-agnostic.  Two factories ship:

  * `PanoramaGenerator` -- the procedural panorama world
    (data/panorama.py), used by tests and the relay; every worker owns a
    disjoint set of worlds (the reference's 0.9/0.1 train/val env split,
    create_rgb_dataset.py:193-194, becomes disjoint world seeds).
  * `HabitatLivePairGenerator` -- real habitat-sim, constructed lazily in
    the worker (import habitat only there), sampling exactly like the
    shard exporter (tools/export_habitat_shards.py:131-189): random
    navigable point, uniform-quaternion start, Euler jitter <=
    max_rotation for the second view, K from the sensor HFOV.

Both satisfy `data.habitat.HabitatGeneratorProtocol`, and so does the
bridge itself -- `train.loop.make_batch_source` plugs it in via
`cfg.dataset = "habitat_live"`.
"""

from __future__ import annotations

import atexit
import multiprocessing as mp
import queue as queue_mod
from typing import Callable, Dict, Optional

import numpy as np


class PanoramaGenerator:
    """Per-worker procedural-world pair generator (picklable factory).

    Mirrors RandomImageGenerator.get_vector_sample semantics
    (create_rgb_dataset.py:231-333): random viewpoint + uniform yaw,
    rotation-jittered second view, GT depth attached for the optional
    supervised-depth loss (z_buffermodel.py:404-407)."""

    def __init__(self, W: int = 128, max_rotation: float = 40.0,
                 num_worlds: int = 8, seed: int = 0):
        self.W = W
        self.max_rotation = max_rotation
        self.num_worlds = num_worlds
        self.seed = seed
        self._worlds = None
        self._rng = None

    def _setup(self):
        from pixelsynth_tpu.data.panorama import make_world

        self._rng = np.random.default_rng(self.seed)
        self._worlds = [make_world(self._rng) for _ in range(self.num_worlds)]

    def sample_pair(self) -> Dict[str, np.ndarray]:
        if self._worlds is None:
            self._setup()
        from pixelsynth_tpu.data.panorama import render_view, sample_pair_cameras

        rng = self._rng
        world = self._worlds[int(rng.integers(self.num_worlds))]
        P0, P1 = sample_pair_cameras(rng, max_rotation=self.max_rotation)
        img0, depth0 = render_view(world, P0, self.W)
        img1, _ = render_view(world, P1, self.W)
        I4 = np.eye(4, dtype=np.float32)
        return {
            "input_img": img0.astype(np.float32),
            "output_img": img1.astype(np.float32),
            "depth_img": depth0.astype(np.float32),
            "K": I4, "Kinv": I4,
            "P_in": P0, "Pinv_in": np.linalg.inv(P0.astype(np.float64)).astype(np.float32),
            "P_out": P1, "Pinv_out": np.linalg.inv(P1.astype(np.float64)).astype(np.float32),
        }


class HabitatLivePairGenerator:
    """Pair generator over a live habitat-sim (imported lazily in the
    worker process -- exactly the construction + sampling loop of
    tools/export_habitat_shards.export_habitat:131-189, kept resident
    instead of writing shards)."""

    def __init__(self, scenes_config: str, max_rotation: float = 40.0,
                 seed: int = 0, reset_every: int = 100):
        self.scenes_config = scenes_config
        self.max_rotation = max_rotation
        self.seed = seed
        self.reset_every = reset_every
        self._env = None

    def _setup(self):  # pragma: no cover - live sim only
        from pixelsynth_tpu.tools.export_habitat_shards import make_habitat_env

        self._rng = np.random.default_rng(self.seed)
        self._env, self._K = make_habitat_env(self.scenes_config)
        self._Kinv = np.linalg.inv(self._K).astype(np.float32)
        self._count = 0

    def sample_pair(self) -> Dict[str, np.ndarray]:  # pragma: no cover
        if self._env is None:
            self._setup()
        from pixelsynth_tpu.tools.export_habitat_shards import (
            render_habitat_pair,
        )

        # episode reset cadence as in the exporter / reference
        # (create_rgb_dataset.py:232-234)
        if self._count % self.reset_every == 0:
            self._env.reset()
        self._count += 1
        images, P, Pinv = render_habitat_pair(self._env, self._rng,
                                              self.max_rotation)
        imgs = images.astype(np.float32) / 255.0 * 2.0 - 1.0
        return {
            "input_img": imgs[0], "output_img": imgs[1],
            "K": self._K.astype(np.float32), "Kinv": self._Kinv,
            "P_in": P[0], "Pinv_in": Pinv[0],
            "P_out": P[1], "Pinv_out": Pinv[1],
        }


def _worker_main(factory: Callable, seed: int, out_q, stop) -> None:
    gen = factory
    if hasattr(gen, "seed"):
        gen.seed = seed
    while not stop.is_set():
        item = gen.sample_pair()
        while not stop.is_set():
            try:
                out_q.put(item, timeout=0.25)
                break
            except queue_mod.Full:
                continue


class VectorGeneratorBridge:
    """N worker processes, each running a HabitatGeneratorProtocol
    generator, pushing pairs into a bounded queue (the reference's 5-env
    VectorEnv fan-out, create_rgb_dataset.py:110,168-194).  Itself
    satisfies HabitatGeneratorProtocol."""

    def __init__(self, factory, num_workers: int = 5, seed: int = 0,
                 queue_depth: Optional[int] = None):
        ctx = mp.get_context("spawn")  # never fork a JAX-initialized host
        self._stop = ctx.Event()
        self._q = ctx.Queue(maxsize=queue_depth or 4 * num_workers)
        self._procs = []
        for w in range(num_workers):
            p = ctx.Process(
                target=_worker_main,
                args=(factory, seed + 1000 * w, self._q, self._stop),
                daemon=True,
            )
            p.start()
            self._procs.append(p)
        atexit.register(self.close)

    def sample_pair(self) -> Dict[str, np.ndarray]:
        return self._q.get()

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        items = [self.sample_pair() for _ in range(batch_size)]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def close(self):
        if self._stop.is_set():
            return
        self._stop.set()
        # drain so producers blocked on put() can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue_mod.Empty:
            pass
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
