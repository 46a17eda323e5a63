"""Encode an extracted image set into VQ codes.

Mirrors extract_code.py:17-50: frozen VQ-VAE encode of every image in a
Custom extraction -> (N, rows, cols) int32 .npy.

Usage: python -m pixelsynth_tpu.tools.extract_code \
    --dataset-folder extraction/ --vqvae-ckpt runs/vqvae --out codes.npy
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from pixelsynth_tpu.config import Config
from pixelsynth_tpu.data.custom import Custom, collate


def extract_codes(cfg: Config, dataset_folder: str, out_path: str,
                  vqvae_ckpt: str | None = None, batch: int = 32):
    from pixelsynth_tpu.models.vqvae import VQVAETop
    from pixelsynth_tpu.train.vqvae import create_vqvae_state

    v = cfg.model.vqvae
    model = VQVAETop(
        in_channel=v.in_channel, channel=v.channel, n_res_block=v.n_res_block,
        n_res_channel=v.n_res_channel, embed_dim=v.embed_dim,
        n_embed=v.n_embed, decay=v.decay,
    )
    state, _ = create_vqvae_state(model, jax.random.PRNGKey(0),
                                  img_size=cfg.model.W)
    if vqvae_ckpt:
        from pixelsynth_tpu.checkpoint import CheckpointManager

        mgr = CheckpointManager(vqvae_ckpt)
        state = mgr.restore(state)
        mgr.close()
    variables = state.variables

    @jax.jit
    def encode(img):
        _, _, _, id_t, _ = model.apply(variables, img, train=False,
                                       method=model.encode)
        return id_t

    ds = Custom(dataset_folder, W=cfg.model.W)
    codes = []
    for i in range(0, len(ds), batch):
        imgs = collate([ds[j] for j in range(i, min(i + batch, len(ds)))])
        codes.append(np.asarray(encode(jnp.asarray(imgs["input_img"]))))
    codes = np.concatenate(codes).astype(np.int32)
    np.save(out_path, codes)
    print(f"wrote {codes.shape} codes to {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-folder", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--vqvae-ckpt", default=None)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args(argv)
    extract_codes(Config(), args.dataset_folder, args.out, args.vqvae_ckpt,
                  args.batch)


if __name__ == "__main__":
    main()
