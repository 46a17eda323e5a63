"""Data sources.  Lazy imports: bridge worker processes
(data/habitat_bridge.py) import this package under spawn, and must not pay
for (or conflict with) a jax import they never use."""


def __getattr__(name):
    if name in ("load_demo_image", "demo_cameras"):
        from pixelsynth_tpu.data import demo_data

        return getattr(demo_data, name)
    if name == "synthetic_pair_batch":
        from pixelsynth_tpu.data.synthetic import synthetic_pair_batch

        return synthetic_pair_batch
    raise AttributeError(name)


__all__ = ["load_demo_image", "demo_cameras", "synthetic_pair_batch"]
