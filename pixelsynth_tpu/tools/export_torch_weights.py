"""Export torchvision / Places365 / FID-Inception / LPIPS weights to npz
for the JAX ports.

Run this once in any environment where torch + the pretrained weights are
available (they are not downloadable from this framework's training
environment):

  python -m pixelsynth_tpu.tools.export_torch_weights --out weights/

Produces:
  * vgg19_features.npz / vgg16_features.npz  -> models/losses.load_torch_vgg19,
    eval/metrics.load_torch_vgg16 (perceptual loss + PercSim);
  * resnet18_places365.npz -> models/classifier.load_torch_resnet18
    (sample re-ranking, demo.py:233-243);
  * inception_fid.npz -> eval/inception.load_torch_inception (the FID net
    the reference invokes via `python -m pytorch_fid`,
    calc_errors_quality.py:135; prefers pytorch_fid's FID-Inception
    weights, falls back to torchvision inception_v3);
  * lpips_vgg_lin.npz -> eval/inception.load_lpips_lin_weights (the linear
    calibration layers of the LPIPS metric, utils/calc_errors.py:209-212).
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
        # PNet --pnet_type variants (pretrained_networks.py:95-194)
        alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
        export_features(alex, os.path.join(args.out, "alexnet_features.npz"))
        sq = torchvision.models.squeezenet1_1(weights="IMAGENET1K_V1").features
        export_features(sq, os.path.join(args.out, "squeezenet_features.npz"))
    except Exception as e:  # no weights cached / no network
        print(f"torchvision weights unavailable: {e}")

    if args.places365_ckpt:
        ckpt = torch.load(args.places365_ckpt, map_location="cpu")
        state = ckpt.get("state_dict", ckpt)
        state = {k.replace("module.", ""): v.cpu().numpy()
                 for k, v in state.items()}
        np.savez(os.path.join(args.out, "resnet18_places365.npz"), **state)
        print("wrote resnet18_places365.npz")

    export_inception_fid(os.path.join(args.out, "inception_fid.npz"))
    export_lpips_lin(os.path.join(args.out, "lpips_vgg_lin.npz"))


def export_inception_fid(path: str):
    """FID InceptionV3: prefer pytorch_fid's fid-weights model (the exact
    network `python -m pytorch_fid` scores with), fall back to torchvision
    inception_v3.  eval/inception.load_torch_inception consumes the npz."""
    try:
        from pytorch_fid.inception import InceptionV3

        net = InceptionV3([3])  # pool3 block; downloads FID weights
        # collapse the block wrapper names back to torch module names
        state = {}
        for k, v in net.state_dict().items():
            k = k.split(".", 2)[-1] if k.startswith("blocks.") else k
            state[k] = v.detach().cpu().numpy()
        np.savez(path, **state)
        print(f"wrote {path} (pytorch_fid weights, {len(state)} arrays)")
        return
    except Exception as e:
        print(f"pytorch_fid unavailable: {e}")
    try:
        import torchvision

        net = torchvision.models.inception_v3(
            weights="IMAGENET1K_V1", aux_logits=True)
        state = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()
                 if not k.startswith("AuxLogits") and not k.startswith("fc")}
        np.savez(path, **state)
        print(f"wrote {path} (torchvision weights, {len(state)} arrays)")
    except Exception as e:
        print(f"torchvision inception unavailable: {e}")


def export_lpips_lin(path: str):
    """LPIPS vgg-variant linear calibration layers (lpips release) ->
    lin<i>.model.1.weight arrays for eval/inception.load_lpips_lin_weights."""
    try:
        import lpips

        net = lpips.LPIPS(net="vgg")
        state = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()
                 if ".model.1.weight" in k}
        np.savez(path, **state)
        print(f"wrote {path} ({len(state)} arrays)")
    except Exception as e:
        print(f"lpips unavailable: {e}")


if __name__ == "__main__":
    main()
