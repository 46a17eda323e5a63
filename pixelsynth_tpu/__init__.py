"""pixelsynth-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of PixelSynth (Rockwell et al., ICCV 2021).

Single image -> 3D-consistent explorable scene:
  depth U-Net -> fused camera reprojection -> differentiable soft z-buffer
  point splatting -> VQ-VAE code-space autoregressive outpainting with a
  locally-masked PixelCNN driven by per-image generation orders -> GAN-trained
  refinement decoding -- with the whole (views x samples) population of the
  autoregressive sampling loop batched on the TPU mesh.

Layout:
  geometry/  cameras, camera paths, fused reprojection
  ops/       splatter (XLA + Pallas), locally-masked conv, distance transform,
             generation orders & kernel masks
  models/    depth U-Net, ResNet encoder/decoder, VQ-VAE, PixelCNN (lmconv),
             discriminators, losses, the ZBuffer pipeline model
  parallel/  mesh + sharding helpers (one mechanism replacing the reference's
             DataParallel / DDP+NCCL / SyncBN trio)
  data/      RealEstate10K / pre-extracted (custom) / synthetic datasets
  train/     stage trainers (vqvae, dpr, lmconv)
  eval/      metric battery & eval harnesses
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "Config":
        from pixelsynth_tpu.config import Config

        return Config
    if name == "PixelSynth":
        from pixelsynth_tpu.pipeline import PixelSynth

        return PixelSynth
    if name == "SceneGenerator":
        from pixelsynth_tpu.scene import SceneGenerator

        return SceneGenerator
    raise AttributeError(name)
