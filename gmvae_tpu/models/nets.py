"""Encoder/decoder stacks as Flax linen modules.

Covers the four architecture families the BASELINE configs require
(BASELINE.json:7-11, SURVEY.md §2.1):

  * ``MLPEncoder/MLPDecoder``   — 2-layer MLP (MNIST) and deeper MLP
                                   (Fashion-MNIST); depth is config-driven.
  * ``ConvEncoder/ConvDecoder`` — strided conv / transposed-conv stacks
                                   (SVHN 32x32, CelebA 64x64).
  * ``ResEncoder/ResDecoder``   — ResNet-style residual blocks (CIFAR-10).

TPU notes: all hot compute is ``nn.Dense``/``nn.Conv`` — large batched
matmuls/convs that XLA tiles onto the MXU. ``compute_dtype`` lets configs run
the matmul path in bfloat16 (MXU-native) while parameters and the ELBO math
stay float32; every module casts activations once on entry and returns
float32 outputs from the final layer.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _flatten(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


class MLPEncoder(nn.Module):
    """MLP feature extractor: flatten -> [Dense+act]*len(hidden)."""
    hidden: Sequence[int] = (512, 512)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _flatten(x).astype(self.compute_dtype)
        for width in self.hidden:
            h = nn.Dense(width, dtype=self.compute_dtype)(h)
            h = nn.relu(h)
        return h.astype(jnp.float32)


class MLPDecoder(nn.Module):
    """MLP generator: Dense stack -> Dense(out) -> reshape to image."""
    hidden: Sequence[int] = (512, 512)
    image_shape: Sequence[int] = (28, 28, 1)
    out_channels_mult: int = 1  # 2 for Gaussian likelihood (mean, logvar)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        h = z.astype(self.compute_dtype)
        for width in self.hidden:
            h = nn.Dense(width, dtype=self.compute_dtype)(h)
            h = nn.relu(h)
        out_dim = math.prod(self.image_shape) * self.out_channels_mult
        h = nn.Dense(out_dim, dtype=self.compute_dtype)(h)
        shape = list(self.image_shape)
        shape[-1] *= self.out_channels_mult
        return h.astype(jnp.float32).reshape(z.shape[0], *shape)


class ConvEncoder(nn.Module):
    """Strided conv stack: halves spatial dims per stage, then Dense."""
    features: Sequence[int] = (64, 128, 256)
    dense: int = 512
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(self.compute_dtype)
        for feat in self.features:
            h = nn.Conv(feat, (4, 4), strides=(2, 2), padding='SAME',
                        dtype=self.compute_dtype)(h)
            h = nn.relu(h)
        h = _flatten(h)
        h = nn.relu(nn.Dense(self.dense, dtype=self.compute_dtype)(h))
        return h.astype(jnp.float32)


class ConvDecoder(nn.Module):
    """Dense -> transposed-conv stack mirroring ConvEncoder."""
    features: Sequence[int] = (256, 128, 64)
    image_shape: Sequence[int] = (32, 32, 3)
    out_channels_mult: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        n_up = len(self.features)
        h0 = self.image_shape[0] // (2 ** n_up)
        w0 = self.image_shape[1] // (2 ** n_up)
        h = z.astype(self.compute_dtype)
        h = nn.Dense(h0 * w0 * self.features[0], dtype=self.compute_dtype)(h)
        h = nn.relu(h).reshape(z.shape[0], h0, w0, self.features[0])
        for feat in self.features[1:]:
            h = nn.ConvTranspose(feat, (4, 4), strides=(2, 2), padding='SAME',
                                 dtype=self.compute_dtype)(h)
            h = nn.relu(h)
        out_ch = self.image_shape[-1] * self.out_channels_mult
        h = nn.ConvTranspose(out_ch, (4, 4), strides=(2, 2), padding='SAME',
                             dtype=self.compute_dtype)(h)
        return h.astype(jnp.float32)


class ResBlock(nn.Module):
    """Pre-activation residual block (two 3x3 convs + skip)."""
    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding='SAME',
                    dtype=self.compute_dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding='SAME',
                    dtype=self.compute_dtype)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.compute_dtype)(x)
        return x + h


class ResEncoder(nn.Module):
    """ResNet-style encoder: [down-conv + ResBlock]*stages -> Dense."""
    features: Sequence[int] = (64, 128, 256)
    blocks_per_stage: int = 1
    dense: int = 512
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(self.compute_dtype)
        for feat in self.features:
            h = nn.Conv(feat, (3, 3), strides=(2, 2), padding='SAME',
                        dtype=self.compute_dtype)(h)
            for _ in range(self.blocks_per_stage):
                h = ResBlock(feat, self.compute_dtype)(h)
        h = nn.relu(h)
        h = _flatten(h)
        h = nn.relu(nn.Dense(self.dense, dtype=self.compute_dtype)(h))
        return h.astype(jnp.float32)


class ResDecoder(nn.Module):
    """ResNet-style decoder: Dense -> [ResBlock + up-conv]*stages."""
    features: Sequence[int] = (256, 128, 64)
    blocks_per_stage: int = 1
    image_shape: Sequence[int] = (32, 32, 3)
    out_channels_mult: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        n_up = len(self.features)
        h0 = self.image_shape[0] // (2 ** n_up)
        w0 = self.image_shape[1] // (2 ** n_up)
        h = z.astype(self.compute_dtype)
        h = nn.Dense(h0 * w0 * self.features[0], dtype=self.compute_dtype)(h)
        h = h.reshape(z.shape[0], h0, w0, self.features[0])
        for feat in self.features:
            for _ in range(self.blocks_per_stage):
                h = ResBlock(feat, self.compute_dtype)(h)
            h = nn.ConvTranspose(feat, (4, 4), strides=(2, 2), padding='SAME',
                                 dtype=self.compute_dtype)(h)
            h = nn.relu(h)
        out_ch = self.image_shape[-1] * self.out_channels_mult
        h = nn.Conv(out_ch, (3, 3), padding='SAME', dtype=self.compute_dtype)(h)
        return h.astype(jnp.float32)


ENCODERS = {'mlp': MLPEncoder, 'conv': ConvEncoder, 'resnet': ResEncoder}
DECODERS = {'mlp': MLPDecoder, 'conv': ConvDecoder, 'resnet': ResDecoder}


def make_encoder(cfg) -> nn.Module:
    """Encoder for a ``configs.Config`` — the arch dispatch shared by every
    model variant (GMVAE, plain VAE, deep-mixture)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    cls = ENCODERS[cfg.arch]
    if cfg.arch == 'mlp':
        return cls(hidden=cfg.enc_hidden, compute_dtype=dtype)
    return cls(features=cfg.enc_hidden, compute_dtype=dtype)


def make_decoder(cfg) -> nn.Module:
    """Decoder for a ``configs.Config``; Gaussian likelihoods double the
    output channels (mean, logvar)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    cls = DECODERS[cfg.arch]
    mult = 2 if cfg.likelihood == 'gaussian' else 1
    common = dict(image_shape=cfg.image_shape, out_channels_mult=mult,
                  compute_dtype=dtype)
    if cfg.arch == 'mlp':
        return cls(hidden=cfg.dec_hidden, **common)
    # stride-2 upsampling stages must reconstruct the exact resolution;
    # floor division would silently emit a smaller image and crash the
    # likelihood with an opaque broadcast error deep inside jit
    factor = 2 ** len(cfg.dec_hidden)
    h, w = cfg.image_shape[0], cfg.image_shape[1]
    if h % factor or w % factor:
        raise ValueError(
            f"arch={cfg.arch!r} upsamples 2x per stage: image_shape "
            f'({h}x{w}) must divide by 2^{len(cfg.dec_hidden)}={factor} '
            f'(use fewer dec_hidden stages or an mlp arch)')
    return cls(features=cfg.dec_hidden, **common)
