"""Fused mixture-ELBO head as a single Pallas TPU (Mosaic) kernel.

BASELINE.json:5 north-star: "the mixture-prior ELBO — log-sum-exp over K
Gaussian components, Gumbel-softmax categorical reparameterization, and
Gaussian reparameterized sampling with on-chip threefry PRNG — fuses into a
single Pallas kernel so the per-step hot loop is one XLA program."

Design
------
One grid over batch tiles; per tile, entirely in VMEM/VPU:

    noise (on-chip threefry / streamed threefry)
      -> Gumbel-softmax relaxation y = softmax((logits + g)/tau)
      -> parameter mixing  mean/logvar = y . q_means / y . q_logvars
      -> Gaussian reparameterization  z = mean + exp(logvar/2) * eps
      -> K-component log-densities under prior AND posterior
      -> two log-sum-exp reductions over K  (mixture prior + mixture posterior)
      -> conditional densities + categorical KL

Noise modes (``noise_mode``):
  * ``'threefry'`` (default on TPU) — noise is generated INSIDE the kernel
    by threefry-2x32 (ops/kernels/threefry.py — the same generator
    jax.random uses, shared jnp source lowered through Mosaic), keyed by the
    caller's threefry key and per-element counters. Bit-identical to the
    host-side replay ``threefry.{gumbel,normal}_from_grid`` with the same
    key: tests/test_kernel.py asserts exact equality.
  * ``'xla'`` — Gumbel/normal noise is drawn OUTSIDE with ``jax.random``
    and streamed in. Bit-compatible with the jnp golden path
    ``ops.elbo.mixture_elbo_head``; interpret mode makes it CPU-runnable.
(A third mode using the TPU's per-core hardware PRNG existed through round
2; it was retired in round 3 — measured slower than the counter-based
threefry path, whose replayability also removes all noise residuals, and
its per-tile seeding used only half the key, a latent correctness trap.)

Backward pass (``custom_vjp``, single hand-derived Pallas kernel in
ops/kernels/fused_elbo_bwd.py): noise handling is mode-dependent —
  * ``'threefry'`` — NO noise residuals. The noise is a counter-based pure
    function of (key, element index), so the backward kernel regenerates
    bit-identical bits on-chip instead of round-tripping [B,K]+[B,D] arrays
    through HBM every step (this is what makes the fused path faster than
    the XLA-fused jnp head, not just equal to it).
  * ``'xla'`` — the caller's streamed-in noise arrays ARE the residuals.
A jnp-replay backward (``jax.vjp`` of ``ops.elbo.head_from_noise``, the
single source of the head's math) remains available as the validation
oracle via ``BWD_IMPL = 'replay'``.
"""

from __future__ import annotations

import functools
import math
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmvae_tpu.ops import dists
from gmvae_tpu.ops.elbo import HeadOutputs, MixturePrior, head_from_noise
from gmvae_tpu.ops.kernels import threefry

LOG2PI = math.log(2.0 * math.pi)
_TWO_PI = 2.0 * math.pi

_MODES = ('threefry', 'xla')


def is_supported() -> bool:
    """Fused path is compiled for real on TPU; elsewhere tests run it in
    interpret mode explicitly."""
    return jax.default_backend() == 'tpu'


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------


def _tile_threefry_noise(key_ref, tb: int, k: int, d: int):
    """On-chip threefry-2x32 Gumbel/normal noise for one batch tile.

    Counters derive from (key, global row, col) with a per-stream salt, so
    the SAME function call from the backward kernel — or the host replay in
    ops/kernels/threefry.py — regenerates bit-identical noise. This is what
    lets the threefry fast path skip noise residuals entirely.

    Both streams ride ONE 20-round threefry pass over a (tb, k+d) grid
    instead of two separately lane-padded passes (k+d = 20 -> one VPU lane
    block for the MNIST config, vs two padded blocks two-pass): the gumbel
    columns carry counters (row, col<k, SALT_GUMBEL) and the normal columns
    (row, col-k, SALT_NORMAL) — exactly the counters the two-pass host
    replay uses, so bits are unchanged.
    """
    k0 = key_ref[0, 0].astype(jnp.uint32)
    k1 = key_ref[0, 1].astype(jnp.uint32)
    row0 = pl.program_id(0) * tb
    n = k + d
    rows = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 0) + row0
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)
    is_g = col < k
    cols = jnp.where(is_g, col, col - k)
    c0 = ((rows.astype(jnp.uint32) << jnp.uint32(16))
          | cols.astype(jnp.uint32))
    c1 = jnp.where(is_g, jnp.uint32(threefry.SALT_GUMBEL),
                   jnp.uint32(threefry.SALT_NORMAL))
    x0, x1 = threefry.threefry2x32(k0, k1, c0, c1)
    u0 = threefry.bits_to_uniform_i32((x0 >> jnp.uint32(8)).astype(jnp.int32))
    g = -jnp.log(-jnp.log(u0[:, :k]))
    u1 = u0[:, k:]
    u2 = threefry.bits_to_uniform_i32(
        (x1 >> jnp.uint32(8)).astype(jnp.int32))[:, k:]
    eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
    return g, eps


def _split_io(rest, noise_mode: str):
    """Unpack a kernel's ``*rest`` refs, shared by both layout variants:
    ['xla': g_in, eps_in], z, y, scal."""
    refs = list(rest)
    g_in_ref = eps_in_ref = None
    if noise_mode == 'xla':
        g_in_ref, eps_in_ref = refs[:2]
        refs = refs[2:]
    z_ref, y_ref, scal_ref = refs[:3]
    return g_in_ref, eps_in_ref, z_ref, y_ref, scal_ref


def _noise_and_gumbel(key_ref, tau_ref, k_logits_ref, g_in_ref, eps_in_ref,
                      tb: int, k: int, d: int, hard: bool,
                      noise_mode: str):
    """Noise acquisition + Gumbel-softmax relaxation, single-sourced for the
    3-D and flat kernels. Returns (g, eps, k_logits_f32, y)."""
    f32 = jnp.float32
    if noise_mode == 'threefry':
        # on-chip, replayable from (key, element index): NO residuals — the
        # backward kernel regenerates the identical bits instead of round-
        # tripping [B,K]+[B,D] noise through HBM every step
        g, eps = _tile_threefry_noise(key_ref, tb, k, d)
    else:  # 'xla': streamed in (residuals are the caller's own noise arrays)
        g = g_in_ref[:]
        eps = eps_in_ref[:]

    tau = tau_ref[0, 0]
    k_logits = k_logits_ref[:].astype(f32)
    # Gumbel-softmax relaxation (log-space stable)
    pert = (k_logits + g) / tau                                   # (TB, K)
    pert = pert - jnp.max(pert, axis=-1, keepdims=True)
    ey = jnp.exp(pert)
    y = ey / jnp.sum(ey, axis=-1, keepdims=True)
    if hard:
        am = jnp.argmax(y, axis=-1)                               # (TB,)
        col = jax.lax.broadcasted_iota(jnp.int32, (tb, k), 1)
        y = jnp.where(col == am[:, None], f32(1.0), f32(0.0))
    return g, eps, k_logits, y


def _kernel(key_ref,           # SMEM (1,2) int32: threefry key halves
            tau_ref,           # SMEM (1,1) float32
            k_logits_ref,      # VMEM (TB, K)
            q_means_ref,       # VMEM (TB, K, D)
            q_logvars_ref,     # VMEM (TB, K, D)
            pi_ref,            # VMEM (1, K)
            p_means_ref,       # VMEM (K, D)
            p_logvars_ref,     # VMEM (K, D)
            *rest,             # ['xla': g_in (TB,K), eps_in (TB,D)]
                               # outputs: z (TB,D), y (TB,K), scal (TB,8)
            hard: bool, noise_mode: str):
    g_in_ref, eps_in_ref, z_ref, y_ref, scal_ref = _split_io(
        rest, noise_mode)
    tb, k = k_logits_ref.shape
    d = z_ref.shape[-1]
    f32 = jnp.float32

    g, eps, k_logits, y = _noise_and_gumbel(
        key_ref, tau_ref, k_logits_ref, g_in_ref, eps_in_ref,
        tb, k, d, hard, noise_mode)
    y_ref[:] = y

    # ---- parameter mixing + reparameterized sample ----------------------
    q_means = q_means_ref[:].astype(f32)                          # (TB,K,D)
    q_logvars = jnp.clip(q_logvars_ref[:].astype(f32),
                         dists.LOGVAR_MIN, dists.LOGVAR_MAX)
    y3 = y[:, :, None]                                            # (TB,K,1)
    mean = jnp.sum(y3 * q_means, axis=1)                          # (TB, D)
    logvar = jnp.sum(y3 * q_logvars, axis=1)                      # (TB, D)
    z = mean + jnp.exp(0.5 * logvar) * eps                        # (TB, D)
    z_ref[:] = z

    # ---- K-component log-densities --------------------------------------
    z3 = z[:, None, :]                                            # (TB,1,D)
    comp_q = -0.5 * jnp.sum(
        jnp.square(z3 - q_means) * jnp.exp(-q_logvars)
        + q_logvars + LOG2PI, axis=-1)                            # (TB, K)
    p_means = p_means_ref[:].astype(f32)[None, :, :]              # (1,K,D)
    p_logvars = jnp.clip(p_logvars_ref[:].astype(f32),
                         dists.LOGVAR_MIN, dists.LOGVAR_MAX)[None, :, :]
    comp_p = -0.5 * jnp.sum(
        jnp.square(z3 - p_means) * jnp.exp(-p_logvars)
        + p_logvars + LOG2PI, axis=-1)                            # (TB, K)

    # ---- the two LSEs over K (the mixture hot loop) ---------------------
    pi_logits = pi_ref[0, :].astype(f32)                          # (K,)
    log_pi = pi_logits - jax.nn.logsumexp(pi_logits)              # (K,)
    log_qk = k_logits - jax.nn.logsumexp(k_logits, axis=-1,
                                         keepdims=True)           # (TB,K)

    a_p = log_pi[None, :] + comp_p                                # (TB,K)
    m_p = jnp.max(a_p, axis=-1, keepdims=True)
    log_prior_mix = (m_p + jnp.log(jnp.sum(jnp.exp(a_p - m_p), axis=-1,
                                           keepdims=True)))[:, 0]
    a_q = log_qk + comp_q
    m_q = jnp.max(a_q, axis=-1, keepdims=True)
    log_q_mix = (m_q + jnp.log(jnp.sum(jnp.exp(a_q - m_q), axis=-1,
                                       keepdims=True)))[:, 0]

    # ---- conditional densities + categorical KL -------------------------
    pm = jnp.sum(y3 * p_means, axis=1)                            # (TB, D)
    plv = jnp.sum(y3 * p_logvars, axis=1)                         # (TB, D)
    log_p_cond = -0.5 * jnp.sum(
        jnp.square(z - pm) * jnp.exp(-plv) + plv + LOG2PI, axis=-1)
    log_q_cond = -0.5 * jnp.sum(
        jnp.square(z - mean) * jnp.exp(-logvar) + logvar + LOG2PI, axis=-1)
    qk = jnp.exp(log_qk)
    kl_cat = jnp.sum(qk * (log_qk - log_pi[None, :]), axis=-1)

    scal = jnp.stack([log_prior_mix, log_q_mix, log_p_cond, log_q_cond,
                      kl_cat], axis=-1)                           # (TB, 5)
    pad = jnp.zeros((tb, 3), f32)
    scal_ref[:] = jnp.concatenate([scal, pad], axis=-1)


# ---------------------------------------------------------------------------
# flat-layout kernel: [TB, K*D] elementwise + selector-matmul reductions
# ---------------------------------------------------------------------------
#
# When D < 128 the (TB, K, D) layout uses D/128 of each VPU lane block —
# ~8% for the MNIST config — while XLA's own fusion of the jnp head runs
# the same math on dim-merged layouts at full lane width. The flat variant
# recovers that: every [B,K,D] tensor lives as (TB, N=K*D) (a free reshape
# outside the kernel), elementwise ops run at N/roundup(N,128) lane use,
# and the K/D-axis reductions/broadcasts become tiny MXU matmuls against
# 0/1 selector matrices generated in-kernel from iota:
#   E  (K,N): E[k,n]  = [n//D == k]   y_exp   = y @ E
#   Et (N,K): E^T                      sum_d   = t @ Et
#   P  (N,D): P[n,d]  = [n%D == d]    sum_k   = t @ P
#   Pt (D,N): P^T                      z_exp   = z @ Pt
# Selected automatically for D < 128 and N <= _FLAT_MAX_N (the 3-D layout
# is already lane-full at D >= 128, and selector matrices for CelebA-scale
# N would not fit VMEM).

_FLAT_MAX_N = 2048


def use_flat_layout(k: int, d: int) -> bool:
    return d < 128 and k * d <= _FLAT_MAX_N


def _selectors(k: int, d: int):
    """In-kernel 0/1 selector matrices (f32) for flat-layout reductions."""
    n = k * d
    nk_row = jax.lax.broadcasted_iota(jnp.int32, (k, n), 0)
    nk_col = jax.lax.broadcasted_iota(jnp.int32, (k, n), 1)
    e = (nk_col // d == nk_row).astype(jnp.float32)          # (K, N)
    et = (jax.lax.broadcasted_iota(jnp.int32, (n, k), 0) // d
          == jax.lax.broadcasted_iota(jnp.int32, (n, k), 1)
          ).astype(jnp.float32)                              # (N, K)
    p = (jax.lax.broadcasted_iota(jnp.int32, (n, d), 0) % d
         == jax.lax.broadcasted_iota(jnp.int32, (n, d), 1)
         ).astype(jnp.float32)                               # (N, D)
    pt = (jax.lax.broadcasted_iota(jnp.int32, (d, n), 1) % d
          == jax.lax.broadcasted_iota(jnp.int32, (d, n), 0)
          ).astype(jnp.float32)                              # (D, N)
    return e, et, p, pt


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _kernel_flat(key_ref,          # SMEM (1,2) int32
                 tau_ref,          # SMEM (1,1) f32
                 k_logits_ref,     # VMEM (TB, K)
                 qm_ref,           # VMEM (TB, N)  flattened q_means
                 qlv_ref,          # VMEM (TB, N)
                 pi_ref,           # VMEM (1, K)
                 pm_ref,           # VMEM (1, N)   flattened prior means
                 plv_ref,          # VMEM (1, N)
                 *rest, k: int, d: int, hard: bool, noise_mode: str):
    g_in_ref, eps_in_ref, z_ref, y_ref, scal_ref = _split_io(
        rest, noise_mode)
    tb = k_logits_ref.shape[0]
    f32 = jnp.float32

    g, eps, k_logits, y = _noise_and_gumbel(
        key_ref, tau_ref, k_logits_ref, g_in_ref, eps_in_ref,
        tb, k, d, hard, noise_mode)
    y_ref[:] = y
    e, et, p, pt = _selectors(k, d)

    qm = qm_ref[:].astype(f32)                                # (TB, N)
    qlv = jnp.clip(qlv_ref[:].astype(f32),
                   dists.LOGVAR_MIN, dists.LOGVAR_MAX)
    y_exp = _dot(y, e)                                        # (TB, N)
    mean = _dot(y_exp * qm, p)                                # (TB, D)
    logvar = _dot(y_exp * qlv, p)                             # (TB, D)
    z = mean + jnp.exp(0.5 * logvar) * eps
    z_ref[:] = z

    z_exp = _dot(z, pt)                                       # (TB, N)
    dq = z_exp - qm
    tq = dq * dq * jnp.exp(-qlv) + qlv
    comp_q = -0.5 * (_dot(tq, et) + d * LOG2PI)               # (TB, K)
    pm = pm_ref[:].astype(f32)                                # (1, N)
    plv = jnp.clip(plv_ref[:].astype(f32),
                   dists.LOGVAR_MIN, dists.LOGVAR_MAX)        # (1, N)
    dp = z_exp - pm
    tp = dp * dp * jnp.exp(-plv) + plv
    comp_p = -0.5 * (_dot(tp, et) + d * LOG2PI)               # (TB, K)

    pi_logits = pi_ref[0, :].astype(f32)
    log_pi = pi_logits - jax.nn.logsumexp(pi_logits)
    log_qk = k_logits - jax.nn.logsumexp(k_logits, axis=-1, keepdims=True)

    a_p = log_pi[None, :] + comp_p
    m_p = jnp.max(a_p, axis=-1, keepdims=True)
    log_prior_mix = (m_p + jnp.log(jnp.sum(jnp.exp(a_p - m_p), axis=-1,
                                           keepdims=True)))[:, 0]
    a_q = log_qk + comp_q
    m_q = jnp.max(a_q, axis=-1, keepdims=True)
    log_q_mix = (m_q + jnp.log(jnp.sum(jnp.exp(a_q - m_q), axis=-1,
                                       keepdims=True)))[:, 0]

    pmean = _dot(y_exp * pm, p)                               # (TB, D)
    plv_mix = _dot(y_exp * plv, p)                            # (TB, D)
    log_p_cond = -0.5 * jnp.sum(
        jnp.square(z - pmean) * jnp.exp(-plv_mix) + plv_mix + LOG2PI,
        axis=-1)
    log_q_cond = -0.5 * jnp.sum(
        jnp.square(z - mean) * jnp.exp(-logvar) + logvar + LOG2PI, axis=-1)
    qk = jnp.exp(log_qk)
    kl_cat = jnp.sum(qk * (log_qk - log_pi[None, :]), axis=-1)

    scal = jnp.stack([log_prior_mix, log_q_mix, log_p_cond, log_q_cond,
                      kl_cat], axis=-1)
    pad = jnp.zeros((tb, 3), f32)
    scal_ref[:] = jnp.concatenate([scal, pad], axis=-1)


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------


def _pick_tile(b: int, k: int, d: int, copies: int = 6) -> int:
    """Batch-tile size: largest multiple-of-8 tile whose working set
    (``copies`` live [TB, K, D] f32 temporaries — ~6 for the forward
    kernels; the backward keeps ~15 alive and must say so) stays within a
    conservative VMEM budget."""
    budget = 6 * 1024 * 1024
    per_row = max(1, copies * k * d * 4)
    tb = max(8, min(512, budget // per_row))
    tb = (tb // 8) * 8
    while b % tb:  # B is padded to a multiple of 8 by the caller
        tb -= 8
    return max(tb, 8)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def vma_union(*arrays) -> frozenset:
    """Union of varying-across-mesh axes of the args (empty outside
    shard_map). Lets pallas_call declare output VMAs so shard_map's
    ``check_vma=True`` replication checker accepts the kernel."""
    out = frozenset()
    for a in arrays:
        if a is not None:
            out = out | getattr(jax.typeof(a), 'vma', frozenset())
    return out


def _pvary_to(a: jax.Array, vma: frozenset) -> jax.Array:
    """Promote ``a`` to carry at least the given varying-across-mesh set."""
    missing = tuple(sorted(vma - getattr(jax.typeof(a), 'vma', frozenset())))
    return jax.lax.pvary(a, missing) if missing else a


@functools.partial(jax.jit, static_argnames=('hard', 'noise_mode',
                                             'interpret'))
def _fused_forward(key_f, tau, k_logits, q_means, q_logvars,
                   pi_logits, p_means, p_logvars, g_in, eps_in,
                   hard: bool, noise_mode: str, interpret: bool):
    # the threefry key rides through custom_vjp as float32 bits (int args
    # would need float0 cotangents); recover int32 here
    key_i = jax.lax.bitcast_convert_type(key_f, jnp.int32).reshape(1, 2)
    b, k = k_logits.shape
    d = q_means.shape[-1]
    bp = _round_up(b, 8)
    if bp != b:
        padb = lambda a: jnp.pad(a, ((0, bp - b),) + ((0, 0),) * (a.ndim - 1))
        k_logits, q_means, q_logvars = map(padb, (k_logits, q_means,
                                                  q_logvars))
        if noise_mode == 'xla':
            g_in, eps_in = map(padb, (g_in, eps_in))
    tb = _pick_tile(bp, k, d)
    grid = (bp // tb,)

    tile = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    smem = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.SMEM)

    vma = vma_union(key_f, tau, k_logits, q_means, q_logvars, pi_logits,
                    p_means, p_logvars, g_in, eps_in)
    # no noise residual traffic in either mode (module docstring): threefry
    # regenerates bit-identical noise on-chip in the backward; xla's
    # streamed-in arrays ARE the residuals and are already kernel inputs
    flat = use_flat_layout(k, d)
    if flat:
        n = k * d
        in_specs = [smem(1, 2), smem(1, 1),
                    tile(tb, k), tile(tb, n), tile(tb, n),
                    full(1, k), full(1, n), full(1, n)]
        operands = [key_i, tau.reshape(1, 1).astype(jnp.float32),
                    k_logits, q_means.reshape(bp, n),
                    q_logvars.reshape(bp, n),
                    pi_logits.reshape(1, k), p_means.reshape(1, n),
                    p_logvars.reshape(1, n)]
    else:
        in_specs = [smem(1, 2), smem(1, 1),
                    tile(tb, k), tile(tb, k, d), tile(tb, k, d),
                    full(1, k), full(k, d), full(k, d)]
        operands = [key_i, tau.reshape(1, 1).astype(jnp.float32),
                    k_logits, q_means, q_logvars,
                    pi_logits.reshape(1, k), p_means, p_logvars]
    if noise_mode == 'xla':
        in_specs += [tile(tb, k), tile(tb, d)]
        operands += [g_in, eps_in]
    out_shape = [
        jax.ShapeDtypeStruct((bp, d), jnp.float32, vma=vma),   # z
        jax.ShapeDtypeStruct((bp, k), jnp.float32, vma=vma),   # y
        jax.ShapeDtypeStruct((bp, 8), jnp.float32, vma=vma),   # packed scalars
    ]
    out_specs = [tile(tb, d), tile(tb, k), tile(tb, 8)]

    if flat:
        kernel = functools.partial(_kernel_flat, k=k, d=d, hard=hard,
                                   noise_mode=noise_mode)
    else:
        kernel = functools.partial(_kernel, hard=hard, noise_mode=noise_mode)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)
    if bp != b:
        outs = tuple(a[:b] for a in outs)
    z, y, scal = outs
    return z, y, scal


# ---------------------------------------------------------------------------
# custom_vjp: kernel forward, exact jnp replay backward
# ---------------------------------------------------------------------------


def _replay(g, eps, k_logits, q_means, q_logvars, pi_logits, p_means,
            p_logvars, tau, hard):
    prior = MixturePrior(pi_logits, p_means, p_logvars)
    out = head_from_noise(g, eps, k_logits, q_means, q_logvars, prior, tau,
                          hard=hard)
    return tuple(out)  # (z, y, log_prior_mix, log_q_mix, log_p_cond,
    #                     log_q_cond, kl_cat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _fused_head(key_f, tau, k_logits, q_means, q_logvars,
                pi_logits, p_means, p_logvars, noise,
                hard: bool, noise_mode: str, interpret: bool):
    g_in, eps_in = noise
    z, y, scal = _fused_forward(
        key_f, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
        p_logvars, g_in, eps_in, hard, noise_mode, interpret)
    return (z, y, scal[:, 0], scal[:, 1], scal[:, 2], scal[:, 3], scal[:, 4])


def _fused_head_fwd(key_f, tau, k_logits, q_means, q_logvars,
                    pi_logits, p_means, p_logvars, noise,
                    hard, noise_mode, interpret):
    g_in, eps_in = noise
    z, y, scal = _fused_forward(
        key_f, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
        p_logvars, g_in, eps_in, hard, noise_mode, interpret)
    if noise_mode == 'threefry':
        # counter-based noise: regenerated in the backward from (key, index)
        res_noise = (None, None)
    else:  # xla: the streamed-in arrays are the residuals — nothing to store
        res_noise = (g_in, eps_in)
    res = (*res_noise, key_f, tau, k_logits, q_means, q_logvars, pi_logits,
           p_means, p_logvars)
    out = (z, y, scal[:, 0], scal[:, 1], scal[:, 2], scal[:, 3], scal[:, 4])
    return out, res


# backward implementation: 'pallas' = the hand-derived single-kernel
# backward (ops/kernels/fused_elbo_bwd.py); 'replay' = jax.vjp of the jnp
# head with the captured noise (the validation oracle). Both are exact.
BWD_IMPL = 'pallas'


def _host_replay_noise(key_f, b: int, k: int, d: int):
    """Host/XLA regeneration of the kernel's threefry streams — identical
    bits by construction (same generator, same (row, col) counters)."""
    key_u = jax.lax.bitcast_convert_type(key_f, jnp.uint32)
    k0, k1 = key_u[0], key_u[1]
    g = threefry.gumbel_from_grid(k0, k1, *threefry.host_grid(b, k))
    eps = threefry.normal_from_grid(k0, k1, *threefry.host_grid(b, d))
    return g, eps


def _fused_head_bwd(hard, noise_mode, interpret, res, cts):
    (g, eps, key_f, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
     p_logvars) = res
    b, k = k_logits.shape
    d = q_means.shape[-1]
    if BWD_IMPL == 'pallas':
        from gmvae_tpu.ops.kernels import fused_elbo_bwd
        d_kl, d_qm, d_qlv, d_pi, d_pm, d_plv = fused_elbo_bwd.pallas_bwd(
            g, eps, k_logits, q_means, q_logvars, pi_logits, p_means,
            p_logvars, tau, tuple(cts), hard=hard, interpret=interpret,
            key_f=key_f)
    else:
        if g is None:  # threefry mode: replay the streams host-side
            g, eps = _host_replay_noise(key_f, b, k, d)
        _, vjp = jax.vjp(
            lambda kl, qm, qlv, pi, pm, plv: _replay(
                g, eps, kl, qm, qlv, pi, pm, plv, tau, hard),
            k_logits, q_means, q_logvars, pi_logits, p_means, p_logvars)
        d_kl, d_qm, d_qlv, d_pi, d_pm, d_plv = vjp(tuple(cts))
    # zero cotangents must carry the primal inputs' exact vma; every input
    # was promoted to the same union in fused_mixture_elbo, and k_logits
    # carries that union
    vma = vma_union(k_logits)
    d_key = _pvary_to(jnp.zeros((2,), jnp.float32), vma)
    if noise_mode == 'xla':
        d_noise = (jnp.zeros((b, k), jnp.float32),
                   jnp.zeros((b, d), jnp.float32))
    else:  # primal noise args were the (1, 1) dummies
        d_noise = (jnp.zeros((1, 1), jnp.float32),
                   jnp.zeros((1, 1), jnp.float32))
    d_noise = tuple(_pvary_to(a, vma) for a in d_noise)
    return (d_key, jnp.zeros_like(tau), d_kl, d_qm,
            d_qlv, d_pi, d_pm, d_plv, d_noise)


_fused_head.defvjp(_fused_head_fwd, _fused_head_bwd)


# ---------------------------------------------------------------------------
# public entry: signature-compatible with ops.elbo.mixture_elbo_head
# ---------------------------------------------------------------------------


def _key_data(key: jax.Array) -> jax.Array:
    """uint32[2] raw key halves from a legacy or typed threefry key."""
    if key.dtype == jnp.uint32:
        return key
    return jax.random.key_data(key)


def fused_mixture_elbo(key: jax.Array,
                       k_logits: jax.Array,
                       q_means: jax.Array,
                       q_logvars: jax.Array,
                       prior: MixturePrior,
                       tau: jax.Array,
                       hard: bool = False,
                       noise_mode: str | None = None,
                       interpret: bool | None = None) -> HeadOutputs:
    """Drop-in fused replacement for ``ops.elbo.mixture_elbo_head``.

    ``noise_mode``: 'threefry' (on-chip threefry-2x32, default on TPU),
    'xla' (threefry noise streamed in, bit-equal to the golden path,
    default off-TPU).

    Differentiability note: ``tau`` is treated as NON-differentiable —
    the custom_vjp returns a zero cotangent for it (training feeds tau
    from a step schedule, never differentiates it). Research that
    optimizes a learned temperature by gradient must use the unfused
    golden head (``fused=False``), whose jnp path carries the true
    d/dtau.
    """
    if noise_mode is None:
        noise_mode = 'threefry' if jax.default_backend() == 'tpu' else 'xla'
    if noise_mode not in _MODES:
        raise ValueError(f'noise_mode must be one of {_MODES}')
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    b, k = k_logits.shape
    d = q_means.shape[-1]
    if b > (1 << 16) or max(k, d) > (1 << 16):
        raise ValueError('threefry counter layout requires B, K, D < 2^16')
    if os.environ.get('GMVAE_LOG_LAYOUT'):
        # trace-time only (once per compile): perf regressions from
        # falling off the flat layout become visible (ADVICE r2 #3)
        layout = 'flat' if use_flat_layout(k, d) else '3d'
        print(f'[fused_elbo] layout={layout} B={b} K={k} D={d} '
              f'noise={noise_mode}', file=sys.stderr)
    if noise_mode == 'xla':
        key_g, key_z = jax.random.split(key)
        g_in = dists.sample_gumbel(key_g, (b, k), jnp.float32)
        eps_in = jax.random.normal(key_z, (b, d), jnp.float32)
    else:
        # in-kernel noise: (1,1) dummies keep the custom_vjp signature
        # uniform without materializing [B,K]+[B,D] zero inputs
        g_in = jnp.zeros((1, 1), jnp.float32)
        eps_in = jnp.zeros((1, 1), jnp.float32)
    key_f = jax.lax.bitcast_convert_type(_key_data(key), jnp.float32)

    tau = jnp.asarray(tau, jnp.float32)
    # under shard_map with check_vma=True, promote every input to the same
    # varying-across-mesh union so the custom_vjp's cotangent types (incl.
    # the zero cotangents for key/tau/noise) match the primal types exactly
    args = (key_f, tau, k_logits, q_means, q_logvars,
            prior.pi_logits, prior.means, prior.logvars, g_in, eps_in)
    vma = vma_union(*args)
    (key_f, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
     p_logvars, g_in, eps_in) = (_pvary_to(a, vma) for a in args)
    z, y, log_prior_mix, log_q_mix, log_p_cond, log_q_cond, kl_cat = (
        _fused_head(key_f, tau, k_logits, q_means, q_logvars,
                    pi_logits, p_means, p_logvars,
                    (g_in, eps_in), hard, noise_mode, interpret))
    return HeadOutputs(z=z, y=y, log_prior_mix=log_prior_mix,
                       log_q_mix=log_q_mix, log_p_cond=log_p_cond,
                       log_q_cond=log_q_cond, kl_cat=kl_cat)
