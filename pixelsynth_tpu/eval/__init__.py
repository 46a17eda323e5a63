from pixelsynth_tpu.eval.metrics import (
    psnr_clamped,
    psnr_masked,
    ssim_metric,
    PercSim,
    fid_from_stats,
    feature_stats,
    inception_score,
    tail_rates,
)

__all__ = [
    "psnr_clamped",
    "psnr_masked",
    "ssim_metric",
    "PercSim",
    "fid_from_stats",
    "feature_stats",
    "inception_score",
    "tail_rates",
]
