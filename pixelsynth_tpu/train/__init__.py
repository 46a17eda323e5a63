from pixelsynth_tpu.train.dpr import DPRTrainState, make_dpr_train_step
from pixelsynth_tpu.train.vqvae import VQTrainState, make_vqvae_train_step
from pixelsynth_tpu.train.lmconv import LMTrainState, make_lmconv_train_step

__all__ = [
    "DPRTrainState",
    "make_dpr_train_step",
    "VQTrainState",
    "make_vqvae_train_step",
    "LMTrainState",
    "make_lmconv_train_step",
]
