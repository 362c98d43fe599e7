"""On-device preprocessing as XLA transforms (BASELINE.json:5).

Dynamic binarization, normalization, and batch selection are pure jittable
functions over device-resident arrays — they fuse into the train step so the
hot loop never touches the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_image(x_uint8: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [0,1]."""
    return x_uint8.astype(jnp.float32) * (1.0 / 255.0)


def dynamic_binarize(key: jax.Array, x01: jax.Array) -> jax.Array:
    """Bernoulli-resample pixels with p = intensity — a fresh mask per call
    (per step/epoch), threefry-keyed. Salakhutdinov-Murray style dynamic
    binarization; the reference applies it to MNIST-family data
    (BASELINE.json:8, SURVEY.md §2.1)."""
    u = jax.random.uniform(key, x01.shape, dtype=x01.dtype)
    return (u < x01).astype(x01.dtype)


def preprocess_batch(key: jax.Array, x_uint8: jax.Array,
                     binarize: bool) -> jax.Array:
    """Full on-device preprocess: normalize (+ dynamic binarization)."""
    x = normalize_image(x_uint8)
    if binarize:
        x = dynamic_binarize(key, x)
    return x


def epoch_batch_indices(key: jax.Array, n_data: int, batch_size: int,
                        n_steps: int) -> jax.Array:
    """Device-resident batch index plan: ``[n_steps, batch_size]`` int32.

    Draws a fresh permutation per epoch (epoch = floor(n_data/batch) steps)
    and tiles epochs until ``n_steps`` is covered; the remainder of each
    permutation is dropped (classic drop-last batching). Runs entirely on
    device so the hot loop's data selection is a gather, not a host feed.
    """
    steps_per_epoch = max(1, n_data // batch_size)
    n_epochs = -(-n_steps // steps_per_epoch)  # cdiv
    keys = jax.random.split(key, n_epochs)
    perms = jax.vmap(lambda k: jax.random.permutation(k, n_data))(keys)
    idx = perms[:, :steps_per_epoch * batch_size]
    idx = idx.reshape(n_epochs * steps_per_epoch, batch_size)
    return idx[:n_steps].astype(jnp.int32)
