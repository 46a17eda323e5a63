"""Export torchvision / Places365 weights to npz for the JAX ports.

Run this once in any environment where torch + the pretrained weights are
available (they are not downloadable from this framework's training
environment):

  python -m pixelsynth_tpu.tools.export_torch_weights --out weights/

Produces vgg19_features.npz, vgg16_features.npz, resnet18_places365.npz
consumed by models/losses.load_torch_vgg19, eval/metrics.load_torch_vgg16,
and models/classifier.load_torch_resnet18.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def export_features(module, path: str):
    state = {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
    np.savez(path, **state)
    print(f"wrote {path} ({len(state)} arrays)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--places365-ckpt", default=None,
                    help="resnet18_places365.pth.tar (from the Places365 release)")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import torch
    import torchvision

    try:
        vgg19 = torchvision.models.vgg19(weights="IMAGENET1K_V1").features
        export_features(vgg19, os.path.join(args.out, "vgg19_features.npz"))
        vgg16 = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
        export_features(vgg16, os.path.join(args.out, "vgg16_features.npz"))
    except Exception as e:  # no weights cached / no network
        print(f"torchvision weights unavailable: {e}")

    if args.places365_ckpt:
        ckpt = torch.load(args.places365_ckpt, map_location="cpu")
        state = ckpt.get("state_dict", ckpt)
        state = {k.replace("module.", ""): v.cpu().numpy()
                 for k, v in state.items()}
        np.savez(os.path.join(args.out, "resnet18_places365.npz"), **state)
        print("wrote resnet18_places365.npz")


if __name__ == "__main__":
    main()
