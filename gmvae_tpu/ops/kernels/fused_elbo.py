"""Fused mixture-ELBO head as a single Pallas TPU (Mosaic) kernel.

BASELINE.json:5 north-star: "the mixture-prior ELBO — log-sum-exp over K
Gaussian components, Gumbel-softmax categorical reparameterization, and
Gaussian reparameterized sampling with on-chip threefry PRNG — fuses into a
single Pallas kernel so the per-step hot loop is one XLA program."

Design
------
One grid over batch tiles; per tile, entirely in VMEM/VPU:

    noise (on-chip threefry / hw PRNG / streamed threefry)
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
  * ``'hw'`` — the TPU's per-core hardware PRNG
    (`pltpu.prng_seed`/`prng_random_bits`), seeded per batch-tile from the
    threefry key. Fastest, streams differ from threefry bit-wise.

Backward pass: the kernel EMITS its noise ``(g, eps)`` alongside the
outputs; ``custom_vjp`` replays ``ops.elbo.head_from_noise`` — the single
source of the head's math — under ``jax.vjp`` with that captured noise, so
gradients are exact for whatever noise the forward actually used, in every
mode. (A hand-rolled backward kernel is a later optimization; the replay is
XLA-fused elementwise math of the same size as the forward.)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmvae_tpu.ops import dists
from gmvae_tpu.ops.elbo import HeadOutputs, MixturePrior, head_from_noise
from gmvae_tpu.ops.kernels import threefry

LOG2PI = math.log(2.0 * math.pi)
_TWO_PI = 2.0 * math.pi
_U24 = 1.0 / (1 << 24)

_MODES = ('threefry', 'xla', 'hw')


def is_supported() -> bool:
    """Fused path is compiled for real on TPU; elsewhere tests run it in
    interpret mode explicitly."""
    return jax.default_backend() == 'tpu'


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------


def _hw_uniform(shape):
    """uint32 hw-PRNG bits -> f32 uniform in (0,1) (Mosaic-safe casts)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    i24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return jnp.maximum(i24.astype(jnp.float32) * _U24, _U24)


def _kernel(key_ref,           # SMEM (1,2) int32: threefry key halves
            tau_ref,           # SMEM (1,1) float32
            k_logits_ref,      # VMEM (TB, K)
            q_means_ref,       # VMEM (TB, K, D)
            q_logvars_ref,     # VMEM (TB, K, D)
            pi_ref,            # VMEM (1, K)
            p_means_ref,       # VMEM (K, D)
            p_logvars_ref,     # VMEM (K, D)
            g_in_ref,          # VMEM (TB, K)  ('xla' mode; zeros otherwise)
            eps_in_ref,        # VMEM (TB, D)  ('xla' mode; zeros otherwise)
            # outputs
            z_ref,             # (TB, D)
            y_ref,             # (TB, K)
            scal_ref,          # (TB, 8): [log_prior_mix, log_q_mix,
                               #           log_p_cond, log_q_cond, kl_cat]
            g_out_ref,         # (TB, K)  noise residual
            eps_out_ref,       # (TB, D)  noise residual
            *, hard: bool, noise_mode: str):
    tb, k = k_logits_ref.shape
    d = z_ref.shape[-1]
    f32 = jnp.float32

    # ---- noise ----------------------------------------------------------
    if noise_mode == 'threefry':
        # on-chip threefry-2x32: same jnp source as the host replay
        k0 = key_ref[0, 0].astype(jnp.uint32)
        k1 = key_ref[0, 1].astype(jnp.uint32)
        row0 = pl.program_id(0) * tb
        rows_k = jax.lax.broadcasted_iota(jnp.int32, (tb, k), 0) + row0
        cols_k = jax.lax.broadcasted_iota(jnp.int32, (tb, k), 1)
        g = threefry.gumbel_from_grid(k0, k1, rows_k, cols_k)
        rows_d = jax.lax.broadcasted_iota(jnp.int32, (tb, d), 0) + row0
        cols_d = jax.lax.broadcasted_iota(jnp.int32, (tb, d), 1)
        eps = threefry.normal_from_grid(k0, k1, rows_d, cols_d)
    elif noise_mode == 'hw':
        # per-tile stream: threefry-derived base seed + tile id
        pltpu.prng_seed(key_ref[0, 0] + pl.program_id(0))
        u_g = _hw_uniform((tb, k))
        g = -jnp.log(-jnp.log(u_g))
        u1 = _hw_uniform((tb, d))
        u2 = _hw_uniform((tb, d))
        eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
    else:  # 'xla': streamed in
        g = g_in_ref[:]
        eps = eps_in_ref[:]
    g_out_ref[:] = g
    eps_out_ref[:] = eps

    tau = tau_ref[0, 0]
    k_logits = k_logits_ref[:].astype(f32)

    # ---- Gumbel-softmax relaxation (log-space stable) -------------------
    pert = (k_logits + g) / tau                                   # (TB, K)
    pert = pert - jnp.max(pert, axis=-1, keepdims=True)
    ey = jnp.exp(pert)
    y = ey / jnp.sum(ey, axis=-1, keepdims=True)
    if hard:
        am = jnp.argmax(y, axis=-1)                               # (TB,)
        col = jax.lax.broadcasted_iota(jnp.int32, (tb, k), 1)
        y = jnp.where(col == am[:, None], f32(1.0), f32(0.0))
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
# pallas_call wrapper
# ---------------------------------------------------------------------------


def _pick_tile(b: int, k: int, d: int) -> int:
    """Batch-tile size: largest multiple-of-8 tile whose working set
    (~6 copies of [TB, K, D] f32) stays within a conservative VMEM budget."""
    budget = 6 * 1024 * 1024
    per_row = max(1, 6 * k * d * 4)
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
        k_logits, q_means, q_logvars, g_in, eps_in = map(
            padb, (k_logits, q_means, q_logvars, g_in, eps_in))
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
    out_shape = (
        jax.ShapeDtypeStruct((bp, d), jnp.float32, vma=vma),   # z
        jax.ShapeDtypeStruct((bp, k), jnp.float32, vma=vma),   # y
        jax.ShapeDtypeStruct((bp, 8), jnp.float32, vma=vma),   # packed scalars
        jax.ShapeDtypeStruct((bp, k), jnp.float32, vma=vma),   # g residual
        jax.ShapeDtypeStruct((bp, d), jnp.float32, vma=vma),   # eps residual
    )
    out_specs = (tile(tb, d), tile(tb, k), tile(tb, 8),
                 tile(tb, k), tile(tb, d))

    kernel = functools.partial(_kernel, hard=hard, noise_mode=noise_mode)
    z, y, scal, g, eps = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(1, 2), smem(1, 1),
                  tile(tb, k), tile(tb, k, d), tile(tb, k, d),
                  full(1, k), full(k, d), full(k, d),
                  tile(tb, k), tile(tb, d)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(key_i, tau.reshape(1, 1).astype(jnp.float32),
      k_logits, q_means, q_logvars,
      pi_logits.reshape(1, k), p_means, p_logvars, g_in, eps_in)
    if bp != b:
        z, y, scal, g, eps = (a[:b] for a in (z, y, scal, g, eps))
    return z, y, scal, g, eps


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
    z, y, scal, g, eps = _fused_forward(
        key_f, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
        p_logvars, g_in, eps_in, hard, noise_mode, interpret)
    return (z, y, scal[:, 0], scal[:, 1], scal[:, 2], scal[:, 3], scal[:, 4])


def _fused_head_fwd(key_f, tau, k_logits, q_means, q_logvars,
                    pi_logits, p_means, p_logvars, noise,
                    hard, noise_mode, interpret):
    g_in, eps_in = noise
    z, y, scal, g, eps = _fused_forward(
        key_f, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
        p_logvars, g_in, eps_in, hard, noise_mode, interpret)
    res = (g, eps, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
           p_logvars)
    out = (z, y, scal[:, 0], scal[:, 1], scal[:, 2], scal[:, 3], scal[:, 4])
    return out, res


# backward implementation: 'pallas' = the hand-derived single-kernel
# backward (ops/kernels/fused_elbo_bwd.py); 'replay' = jax.vjp of the jnp
# head with the captured noise (the validation oracle). Both are exact.
BWD_IMPL = 'pallas'


def _fused_head_bwd(hard, noise_mode, interpret, res, cts):
    (g, eps, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
     p_logvars) = res
    if BWD_IMPL == 'pallas':
        from gmvae_tpu.ops.kernels import fused_elbo_bwd
        d_kl, d_qm, d_qlv, d_pi, d_pm, d_plv = fused_elbo_bwd.pallas_bwd(
            g, eps, k_logits, q_means, q_logvars, pi_logits, p_means,
            p_logvars, tau, tuple(cts), hard=hard, interpret=interpret)
    else:
        _, vjp = jax.vjp(
            lambda kl, qm, qlv, pi, pm, plv: _replay(
                g, eps, kl, qm, qlv, pi, pm, plv, tau, hard),
            k_logits, q_means, q_logvars, pi_logits, p_means, p_logvars)
        d_kl, d_qm, d_qlv, d_pi, d_pm, d_plv = vjp(tuple(cts))
    # zero cotangents must carry the primal inputs' exact vma; every input
    # was promoted to the same union in fused_mixture_elbo, and the kernel
    # residual ``g`` carries that union
    d_key = _pvary_to(jnp.zeros((2,), jnp.float32), vma_union(g))
    return (d_key, jnp.zeros_like(tau), d_kl, d_qm,
            d_qlv, d_pi, d_pm, d_plv,
            (jnp.zeros_like(g), jnp.zeros_like(eps)))


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
    default off-TPU), 'hw' (TPU hardware PRNG, fastest).
    """
    if noise_mode is None:
        noise_mode = 'threefry' if jax.default_backend() == 'tpu' else 'xla'
    if noise_mode == 'tpu':  # back-compat alias
        noise_mode = 'hw'
    if noise_mode not in _MODES:
        raise ValueError(f'noise_mode must be one of {_MODES}')
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    b, k = k_logits.shape
    d = q_means.shape[-1]
    if b > (1 << 16) or max(k, d) > (1 << 16):
        raise ValueError('threefry counter layout requires B, K, D < 2^16')
    if noise_mode == 'xla':
        key_g, key_z = jax.random.split(key)
        g_in = dists.sample_gumbel(key_g, (b, k), jnp.float32)
        eps_in = jax.random.normal(key_z, (b, d), jnp.float32)
    else:
        g_in = jnp.zeros((b, k), jnp.float32)
        eps_in = jnp.zeros((b, d), jnp.float32)
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
