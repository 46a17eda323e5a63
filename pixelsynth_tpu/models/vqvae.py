"""VQ-VAE-2 (top-only variant used by PixelSynth) in Flax, NHWC.

Mirrors models/vqvae2/vqvae.py:
  * `Quantize` (27-77): nearest-codebook assignment with EMA codebook
    updates.  The reference all-reduces the one-hot counts and sums over
    NCCL (vqvae.py:57-58); here the sums are taken over the *global* sharded
    batch, which GSPMD lowers to the same collective over ICI -- no explicit
    communication code.  EMA state lives in the mutable "ema" collection.
  * `Encoder` stride-4 / stride-2 stacks (98-126), `Decoder` (129-161),
  * `VQVAETop` (240-312): 256 -> 32x32 grid of 512-way codes, decode from
    the top level only;  `VQVAE` (164-238): the full two-level model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class Quantize(nn.Module):
    dim: int = 64
    n_embed: int = 512
    decay: float = 0.99
    eps: float = 1e-5

    def setup(self):
        init = nn.initializers.normal(stddev=1.0)
        # codebook + EMA stats as non-trainable variables (the reference
        # registers buffers, vqvae.py:36-39)
        self.embed = self.variable(
            "ema", "embed", init, self.make_rng("params") if self.is_initializing() else None,
            (self.dim, self.n_embed),
        )
        self.cluster_size = self.variable(
            "ema", "cluster_size", lambda *_: jnp.zeros((self.n_embed,)), None
        )
        self.embed_avg = self.variable(
            "ema", "embed_avg", lambda *_: jnp.array(self.embed.value), None
        )

    def __call__(self, x: jnp.ndarray, *, train: bool = True):
        """x: (..., dim).  Returns (quantized, diff, indices)."""
        flat = x.reshape(-1, self.dim)
        embed = self.embed.value
        dist = (
            jnp.sum(flat ** 2, 1, keepdims=True)
            - 2 * flat @ embed
            + jnp.sum(embed ** 2, 0, keepdims=True)
        )
        idx = jnp.argmin(dist, axis=1)
        onehot = jax.nn.one_hot(idx, self.n_embed, dtype=flat.dtype)
        idx = idx.reshape(x.shape[:-1])
        quantized = self.embed_code(idx)

        if train and not self.is_initializing() and self.is_mutable_collection("ema"):
            # global sums over the sharded batch (the NCCL all_reduce of
            # vqvae.py:57-58 falls out of GSPMD automatically)
            onehot_sum = jnp.sum(onehot, axis=0)
            embed_sum = flat.T @ onehot
            cs = self.cluster_size.value * self.decay + onehot_sum * (1 - self.decay)
            ea = self.embed_avg.value * self.decay + embed_sum * (1 - self.decay)
            n = jnp.sum(cs)
            cs_norm = (cs + self.eps) / (n + self.n_embed * self.eps) * n
            self.cluster_size.value = cs
            self.embed_avg.value = ea
            self.embed.value = ea / cs_norm[None, :]

        diff = jnp.mean((jax.lax.stop_gradient(quantized) - x) ** 2)
        quantized = x + jax.lax.stop_gradient(quantized - x)
        return quantized, diff, idx

    def embed_code(self, idx: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.embed.value.T, idx, axis=0)


class ResBlock(nn.Module):
    channel: int

    @nn.compact
    def __call__(self, x):
        # NOTE: the residual adds relu(x), not x.  The reference's first
        # ReLU is inplace=True (vqvae.py:86) and mutates the block input
        # before `out += input` runs (vqvae.py:94), so its effective
        # semantics are conv(relu(x)) + relu(x).
        r = nn.relu(x)
        h = nn.Conv(self.channel, (3, 3), padding=1)(r)
        h = nn.relu(h)
        h = nn.Conv(x.shape[-1], (1, 1))(h)
        return r + h


class Encoder(nn.Module):
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        if self.stride == 4:
            x = nn.Conv(self.channel // 2, (4, 4), strides=2, padding=1)(x)
            x = nn.relu(x)
            x = nn.Conv(self.channel, (4, 4), strides=2, padding=1)(x)
            x = nn.relu(x)
            x = nn.Conv(self.channel, (3, 3), padding=1)(x)
        elif self.stride == 2:
            x = nn.Conv(self.channel // 2, (4, 4), strides=2, padding=1)(x)
            x = nn.relu(x)
            x = nn.Conv(self.channel, (3, 3), padding=1)(x)
        for _ in range(self.n_res_block):
            x = ResBlock(self.n_res_channel)(x)
        return nn.relu(x)


class Decoder(nn.Module):
    out_channel: int
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channel, (3, 3), padding=1)(x)
        for _ in range(self.n_res_block):
            x = ResBlock(self.n_res_channel)(x)
        x = nn.relu(x)
        if self.stride == 4:
            x = nn.ConvTranspose(self.channel // 2, (4, 4), strides=(2, 2), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(self.out_channel, (4, 4), strides=(2, 2), padding="SAME")(x)
        elif self.stride == 2:
            x = nn.ConvTranspose(self.out_channel, (4, 4), strides=(2, 2), padding="SAME")(x)
        return x


class VQVAETop(nn.Module):
    """Top-only VQ-VAE-2 (vqvae.py:240-312): 256x256x3 -> 32x32 codes."""

    in_channel: int = 3
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    decay: float = 0.99

    def setup(self):
        self.enc_b = Encoder(self.channel, self.n_res_block, self.n_res_channel, 4)
        self.enc_t = Encoder(self.channel, self.n_res_block, self.n_res_channel, 2)
        self.quantize_conv_t = nn.Conv(self.embed_dim, (1, 1))
        self.quantize_t = Quantize(self.embed_dim, self.n_embed, self.decay)
        self.dec_t = Decoder(
            self.embed_dim, self.channel, self.n_res_block, self.n_res_channel, 2
        )
        self.quantize_conv_b = nn.Conv(self.embed_dim, (1, 1))
        self.quantize_b = Quantize(self.embed_dim, self.n_embed, self.decay)
        self.upsample_t = nn.ConvTranspose(
            self.embed_dim, (4, 4), strides=(2, 2), padding="SAME"
        )
        self.dec = Decoder(
            self.in_channel, self.channel, self.n_res_block, self.n_res_channel, 4
        )

    def __call__(self, x, *, train: bool = True):
        quant_t, _, diff, _, _ = self.encode(x, train=train)
        return self.decode(quant_t), diff

    def encode(self, x, *, train: bool = True):
        """Returns (quant_t, quant_b, diff, id_t, id_b) like vqvae.py:280-297."""
        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)
        qt = self.quantize_conv_t(enc_t)
        quant_t, diff_t, id_t = self.quantize_t(qt, train=train)
        dec_t = self.dec_t(quant_t)
        enc_b = jnp.concatenate([dec_t, enc_b], axis=-1)
        qb = self.quantize_conv_b(enc_b)
        quant_b, diff_b, id_b = self.quantize_b(qb, train=train)
        return quant_t, quant_b, diff_t + diff_b, id_t, id_b

    def decode(self, quant_t):
        return self.dec(self.upsample_t(quant_t))

    def decode_code(self, code_t):
        quant_t = self.quantize_t.embed_code(code_t)
        return self.decode(quant_t)

    def pre_quantize(self, x):
        """Raw pre-quantization latents (qt, qb) for data-dependent codebook
        initialization (see train/vqvae.init_codebook_from_batch).  qb is
        computed through the *current* top codebook."""
        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)
        qt = self.quantize_conv_t(enc_t)
        quant_t, _, _ = self.quantize_t(qt, train=False)
        dec_t = self.dec_t(quant_t)
        qb = self.quantize_conv_b(jnp.concatenate([dec_t, enc_b], axis=-1))
        return qt, qb


class VQVAE(nn.Module):
    """Full two-level VQ-VAE-2 (vqvae.py:164-238)."""

    in_channel: int = 3
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    decay: float = 0.99

    def setup(self):
        self.enc_b = Encoder(self.channel, self.n_res_block, self.n_res_channel, 4)
        self.enc_t = Encoder(self.channel, self.n_res_block, self.n_res_channel, 2)
        self.quantize_conv_t = nn.Conv(self.embed_dim, (1, 1))
        self.quantize_t = Quantize(self.embed_dim, self.n_embed, self.decay)
        self.dec_t = Decoder(
            self.embed_dim, self.channel, self.n_res_block, self.n_res_channel, 2
        )
        self.quantize_conv_b = nn.Conv(self.embed_dim, (1, 1))
        self.quantize_b = Quantize(self.embed_dim, self.n_embed, self.decay)
        self.upsample_t = nn.ConvTranspose(
            self.embed_dim, (4, 4), strides=(2, 2), padding="SAME"
        )
        self.dec = Decoder(
            self.in_channel, self.channel, self.n_res_block, self.n_res_channel, 4
        )

    def __call__(self, x, *, train: bool = True):
        quant_t, quant_b, diff, _, _ = self.encode(x, train=train)
        return self.decode(quant_t, quant_b), diff

    def encode(self, x, *, train: bool = True):
        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)
        qt = self.quantize_conv_t(enc_t)
        quant_t, diff_t, id_t = self.quantize_t(qt, train=train)
        dec_t = self.dec_t(quant_t)
        enc_b = jnp.concatenate([dec_t, enc_b], axis=-1)
        qb = self.quantize_conv_b(enc_b)
        quant_b, diff_b, id_b = self.quantize_b(qb, train=train)
        return quant_t, quant_b, diff_t + diff_b, id_t, id_b

    def decode(self, quant_t, quant_b):
        up_t = self.upsample_t(quant_t)
        return self.dec(jnp.concatenate([up_t, quant_b], axis=-1))

    def decode_code(self, code_t, code_b):
        quant_t = self.quantize_t.embed_code(code_t)
        quant_b = self.quantize_b.embed_code(code_b)
        return self.decode(quant_t, quant_b)
