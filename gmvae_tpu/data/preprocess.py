"""On-device preprocessing as XLA transforms (BASELINE.json:5).

Dynamic binarization, normalization, and batch selection are pure jittable
functions over device-resident arrays — they fuse into the train step so the
hot loop never touches the host.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def packed_width(image_shape) -> int:
    """int32 words per packed example row: ceil(prod(shape) / 4)."""
    return -(-int(np.prod(image_shape)) // 4)


def pack_rows(x_uint8: np.ndarray) -> np.ndarray:
    """[N, *shape] uint8 -> [N, ceil(P/4)] int32, 4 bytes little-endian
    per word (host-side, exact, zero-padded tail).

    Why: a u8[N,28,28] image array tiles to T(8,128)(4,1) on TPU — every
    784-byte example pads to a ~4 KB strided footprint, and the per-step
    batch gather pays it per row (measured 33.9 us/step = 36% of the
    flagship step, the single largest op — tools/profile_attr.py on a
    real v5e trace). Packed int32 rows give the gather a flat lane-major
    layout; ``unpack_rows`` restores the IDENTICAL bytes on device, so
    training trajectories are bit-equal by construction
    (tests/test_data.py)."""
    n = x_uint8.shape[0]
    flat = np.ascontiguousarray(x_uint8.reshape(n, -1))
    pad = (-flat.shape[1]) % 4
    if pad:
        flat = np.pad(flat, ((0, 0), (0, pad)))
    # explicit little-endian: the on-device unpack shifts by (0,8,16,24)
    return flat.view('<i4')


def unpack_rows(w: jax.Array, image_shape) -> jax.Array:
    """int32 [..., W] packed rows -> uint8 [..., *shape]; exact inverse of
    ``pack_rows`` (jittable; fuses into the preprocess that follows)."""
    p = int(np.prod(image_shape))
    shifts = jnp.array([0, 8, 16, 24], dtype=jnp.int32)
    # arithmetic shift + 0xFF mask recovers each byte exactly (the mask
    # discards sign-extension bits)
    b = (w[..., None] >> shifts) & 0xFF
    b = b.astype(jnp.uint8).reshape(*w.shape[:-1], w.shape[-1] * 4)
    return b[..., :p].reshape(*w.shape[:-1], *image_shape)


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


def epoch_keys(key: jax.Array, e0, n_ep: int) -> jax.Array:
    """``jax.random.split(key, e0 + n_ep)[e0:]`` without materializing the
    prefix — the ``[n_ep, 2]`` result shape is CONSTANT in ``e0``.

    jax's (partitionable, the modern default) threefry split is
    counter-based: element ``i`` of ``split(key, N)`` is
    ``threefry2x32(key, counter=(0, i))``, independent of the total count
    ``N`` (jax._src.prng._threefry_split_foldlike) — the prefix-stability
    windowed plan generation has always relied on. Computing the
    ``[e0, e0+n_ep)`` counter block directly makes every plan window the
    same SHAPE regardless of its position, so ``e0`` can be traced data
    and ONE compiled generator serves every window of a run; the
    split-then-slice form made window position a shape, compiling a fresh
    program per window mid-run over the remote-compile tunnel.
    Bit-equality with ``jax.random.split`` is pinned by
    tests/test_data.py against the installed jax, so a jax upgrade that
    changed the split layout would fail loudly, not drift silently.
    """
    from gmvae_tpu.ops.kernels.threefry import threefry2x32
    c1 = jnp.asarray(e0, jnp.uint32) + jnp.arange(n_ep, dtype=jnp.uint32)
    x0, x1 = threefry2x32(key[0], key[1], jnp.zeros_like(c1), c1)
    return jnp.stack([x0, x1], axis=-1)


def epoch_batch_indices(key: jax.Array, n_data: int, batch_size: int,
                        n_steps: int, start_step=0) -> jax.Array:
    """Device-resident batch index plan: ``[n_steps, batch_size]`` int32
    covering steps ``[start_step, start_step + n_steps)``.

    Draws a fresh permutation per epoch (epoch = floor(n_data/batch) steps)
    and tiles epochs until the window is covered; the remainder of each
    permutation is dropped (classic drop-last batching). Runs entirely on
    device so the hot loop's data selection is a gather, not a host feed.

    Windowed generation materializes only the epochs the window touches, so
    a long run can build its plan chunk by chunk in O(chunk) device memory.
    Identical trajectories regardless of chunking: ``jax.random.split(key,
    n)`` is prefix-stable in ``n`` (counter-based threefry), so epoch ``e``'s
    permutation is a pure function of ``(key, e)``.

    Shape stability: the number of epochs materialized is a CONSTANT
    ``cdiv(n_steps, steps_per_epoch) + 1`` regardless of how ``start_step``
    aligns inside an epoch, the epoch keys come from ``epoch_keys`` (shape
    constant in the window position), and the final window slice uses a
    dynamic start — so ``start_step`` may be a TRACED scalar and one
    executable serves every window of a run (``Trainer.batch_plan`` jits
    this with the window position as data; the pre-r5 split-then-slice
    form recompiled per window over the remote-compile tunnel).
    """
    if batch_size > n_data:
        raise ValueError(
            f'batch_size {batch_size} exceeds the dataset ({n_data} '
            f'examples) — drop-last epoch batching cannot form one batch '
            f'(with sharded data this is the PER-SHARD partition size)')
    steps_per_epoch = max(1, n_data // batch_size)
    e0 = start_step // steps_per_epoch
    n_ep = -(-n_steps // steps_per_epoch) + 1  # cdiv + 1: any alignment
    keys = epoch_keys(key, e0, n_ep)
    perms = jax.vmap(lambda k: jax.random.permutation(k, n_data))(keys)
    idx = perms[:, :steps_per_epoch * batch_size]
    idx = idx.reshape(n_ep * steps_per_epoch, batch_size)
    off = start_step - e0 * steps_per_epoch
    return jax.lax.dynamic_slice_in_dim(idx, jnp.asarray(off, jnp.int32),
                                        n_steps).astype(jnp.int32)
