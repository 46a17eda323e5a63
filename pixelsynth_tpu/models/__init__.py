from pixelsynth_tpu.models.unet import UNet
from pixelsynth_tpu.models.vqvae import VQVAETop, VQVAE
from pixelsynth_tpu.models.lmconv import LMPixelCNN
from pixelsynth_tpu.models.encoderdecoder import ResNetEncoder, ResNetDecoder
from pixelsynth_tpu.models.discriminators import MultiscaleDiscriminator

__all__ = [
    "UNet",
    "VQVAETop",
    "VQVAE",
    "LMPixelCNN",
    "ResNetEncoder",
    "ResNetDecoder",
    "MultiscaleDiscriminator",
]
