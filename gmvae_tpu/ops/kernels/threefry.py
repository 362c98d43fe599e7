"""Threefry-2x32 counter-based PRNG, shared between host jnp and Pallas.

The north star (BASELINE.json:5) specifies "Gaussian reparameterized sampling
with on-chip threefry PRNG". This module implements threefry-2x32 (Salmon et
al., SC'11 — the same generator jax.random uses; verified bit-identical to
``jax._src.prng.threefry_2x32``) in pure jnp uint32 ops: shifts, ors, xors,
adds. Those lower both through XLA on host AND through Mosaic inside a
Pallas kernel, so the fused ELBO kernel can generate its Gumbel/normal noise
on-chip while a host-side replay reproduces the exact same bits for
validation and for the custom_vjp backward.

Counter layout: one (c0, c1) counter pair per tensor element,
``c0 = (global_row << 16) | col``, ``c1 = salt`` (one salt per noise
stream). Unique for row < 2^16 and col < 2^16 — enforced by the caller.
Each pair yields two uint32 outputs: uniforms use x0, Box-Muller normals
use (x0, x1).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_U24 = 1.0 / (1 << 24)
_TWO_PI = 2.0 * math.pi

SALT_GUMBEL = 0x47554D42   # 'GUMB'
SALT_NORMAL = 0x4E4F524D   # 'NORM'

# threefry-2x32 rotation schedule
_ROTS = ((13, 15, 26, 6), (17, 29, 16, 24))


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k0, k1, c0, c1):
    """20-round threefry-2x32. All args uint32 (scalars broadcast).

    Bit-identical to jax.random's generator for the same key/counters.
    """
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(c0, jnp.uint32) + k0
    x1 = jnp.asarray(c1, jnp.uint32) + k1
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    ks = (k1, ks2, k0)
    for i in range(5):
        for r in _ROTS[i % 2]:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[i % 3]
        x1 = x1 + ks[(i + 1) % 3] + jnp.uint32(i + 1)
    return x0, x1


def bits_to_uniform_i32(i24: jnp.ndarray) -> jnp.ndarray:
    """int32 in [0, 2^24) -> float32 uniform in (0, 1), clamped off 0."""
    u = i24.astype(jnp.float32) * _U24
    return jnp.maximum(u, _U24)


def _element_counters(rows: jnp.ndarray, cols: jnp.ndarray, salt: int):
    """(c0, c1) uint32 counter arrays for a [rows x cols] element grid."""
    c0 = (rows.astype(jnp.uint32) << jnp.uint32(16)) | cols.astype(jnp.uint32)
    c1 = jnp.full(c0.shape, jnp.uint32(salt))
    return c0, c1


def _bits24(x: jnp.ndarray) -> jnp.ndarray:
    """Top 24 bits of a uint32 stream as NON-NEGATIVE int32 (Mosaic has no
    uint32->float cast; int32 in [0, 2^24) casts fine)."""
    return (x >> jnp.uint32(8)).astype(jnp.int32)


def gumbel_from_grid(k0, k1, rows: jnp.ndarray, cols: jnp.ndarray):
    """Standard Gumbel(0,1) noise, one draw per (row, col) element.

    ``rows``/``cols`` are integer index arrays of the output shape (host:
    arange outer-product; kernel: broadcasted_iota offset by program_id).
    """
    c0, c1 = _element_counters(rows, cols, SALT_GUMBEL)
    x0, _ = threefry2x32(k0, k1, c0, c1)
    u = bits_to_uniform_i32(_bits24(x0))
    return -jnp.log(-jnp.log(u))


def normal_from_grid(k0, k1, rows: jnp.ndarray, cols: jnp.ndarray):
    """Standard normal noise via Box-Muller, one draw per element.

    Uses both threefry outputs of the element's counter pair, so no second
    pass is needed.
    """
    c0, c1 = _element_counters(rows, cols, SALT_NORMAL)
    x0, x1 = threefry2x32(k0, k1, c0, c1)
    u1 = bits_to_uniform_i32(_bits24(x0))
    u2 = bits_to_uniform_i32(_bits24(x1))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def host_grid(b: int, n: int, row0: int = 0):
    """Host-side (rows, cols) index grids matching the kernel's iota."""
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None] + row0,
                            (b, n))
    cols = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (b, n))
    return rows, cols
