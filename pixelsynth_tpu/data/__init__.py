from pixelsynth_tpu.data.demo_data import load_demo_image, demo_cameras
from pixelsynth_tpu.data.synthetic import synthetic_pair_batch

__all__ = ["load_demo_image", "demo_cameras", "synthetic_pair_batch"]
