"""Fused mixture-ELBO head as a single Pallas TPU (Mosaic) kernel.

BASELINE.json:5 north-star: "the mixture-prior ELBO — log-sum-exp over K
Gaussian components, Gumbel-softmax categorical reparameterization, and
Gaussian reparameterized sampling with on-chip threefry PRNG — fuses into a
single Pallas kernel so the per-step hot loop is one XLA program."

Design
------
One grid over batch tiles; per tile, entirely in VMEM/VPU:

    noise (in-kernel PRNG or prefetched threefry noise)
      -> Gumbel-softmax relaxation y = softmax((logits + g)/tau)
      -> parameter mixing  mean/logvar = y . q_means / y . q_logvars
      -> Gaussian reparameterization  z = mean + exp(logvar/2) * eps
      -> K-component log-densities under prior AND posterior
      -> two log-sum-exp reductions over K  (mixture prior + mixture posterior)
      -> conditional densities + categorical KL

Noise modes (``noise_mode``):
  * ``'xla'``  — Gumbel/normal noise is drawn OUTSIDE with ``jax.random``
    (threefry) and streamed in. Bit-compatible with the jnp golden path
    ``ops.elbo.mixture_elbo_head`` — this is what CI equivalence tests use,
    and interpret mode makes it runnable on CPU.
  * ``'tpu'``  — noise is generated INSIDE the kernel with the TPU's
    per-core hardware PRNG (`pltpu.prng_seed`/`prng_random_bits`), seeded
    per batch-tile from the threefry key. Saves the [B,K]+[B,D] noise
    round-trip through HBM; the streams differ from threefry bit-wise but
    are validated distributionally (tests/test_kernel.py).

Backward pass: the kernel EMITS its noise ``(g, eps)`` alongside the
outputs; ``custom_vjp`` replays ``ops.elbo.head_from_noise`` — the single
source of the head's math — under ``jax.vjp`` with that captured noise, so
gradients are exact for whatever noise the forward actually used, in both
modes. (Hand-rolled backward kernel is a later optimization; the replay is
XLA-fused elementwise math of the same size as the forward.)
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmvae_tpu.ops import dists
from gmvae_tpu.ops.elbo import HeadOutputs, MixturePrior, head_from_noise

LOG2PI = math.log(2.0 * math.pi)
_TWO_PI = 2.0 * math.pi
# uniforms from 24 high bits: u in [2^-24, 1 - 2^-24] after clamping
_U24 = 1.0 / (1 << 24)


def is_supported() -> bool:
    """Fused path is compiled for real on TPU; elsewhere tests run it in
    interpret mode explicitly."""
    return jax.default_backend() == 'tpu'


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------


def _bits_to_uniform(bits):
    """uint32 -> float32 uniform in (0, 1): top 24 bits, clamped off 0.

    Mosaic has no uint32->f32 cast; shift down to 24 bits (always positive),
    reinterpret as int32, and cast from there.
    """
    i24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    u = i24.astype(jnp.float32) * _U24
    return jnp.maximum(u, _U24)


def _kernel(seed_ref,          # SMEM (1,1) int32   (tpu mode; dummy in xla)
            tau_ref,           # SMEM (1,1) float32
            k_logits_ref,      # VMEM (TB, K)
            q_means_ref,       # VMEM (TB, K, D)
            q_logvars_ref,     # VMEM (TB, K, D)
            pi_ref,            # VMEM (1, K)
            p_means_ref,       # VMEM (K, D)
            p_logvars_ref,     # VMEM (K, D)
            g_in_ref,          # VMEM (TB, K)  (xla mode; dummy in tpu)
            eps_in_ref,        # VMEM (TB, D)  (xla mode; dummy in tpu)
            # outputs
            z_ref,             # (TB, D)
            y_ref,             # (TB, K)
            scal_ref,          # (TB, 8): [log_prior_mix, log_q_mix,
                               #           log_p_cond, log_q_cond, kl_cat]
            g_out_ref,         # (TB, K)  noise residual
            eps_out_ref,       # (TB, D)  noise residual
            *, hard: bool, in_kernel_prng: bool):
    tb, k = k_logits_ref.shape
    d = z_ref.shape[-1]
    f32 = jnp.float32

    # ---- noise ----------------------------------------------------------
    if in_kernel_prng:
        # per-tile stream: threefry-derived base seed + tile id
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        u_g = _bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits((tb, k)), jnp.uint32))
        g = -jnp.log(-jnp.log(u_g))
        # Box-Muller for the Gaussian draw
        u1 = _bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits((tb, d)), jnp.uint32))
        u2 = _bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits((tb, d)), jnp.uint32))
        eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
    else:
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
    # posterior components: (TB, K)
    comp_q = -0.5 * jnp.sum(
        jnp.square(z3 - q_means) * jnp.exp(-q_logvars)
        + q_logvars + LOG2PI, axis=-1)
    # prior components, broadcast over the tile: (TB, K)
    p_means = p_means_ref[:].astype(f32)[None, :, :]              # (1,K,D)
    p_logvars = jnp.clip(p_logvars_ref[:].astype(f32),
                         dists.LOGVAR_MIN, dists.LOGVAR_MAX)[None, :, :]
    comp_p = -0.5 * jnp.sum(
        jnp.square(z3 - p_means) * jnp.exp(-p_logvars)
        + p_logvars + LOG2PI, axis=-1)

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


@functools.partial(jax.jit, static_argnames=('hard', 'in_kernel_prng',
                                             'interpret'))
def _fused_forward(seed_f, tau, k_logits, q_means, q_logvars,
                   pi_logits, p_means, p_logvars, g_in, eps_in,
                   hard: bool, in_kernel_prng: bool, interpret: bool):
    # seed rides through custom_vjp as float32 bits (int args would need
    # float0 cotangents); recover the int32 here
    seed = jax.lax.bitcast_convert_type(seed_f, jnp.int32)
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
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    out_shape = (
        jax.ShapeDtypeStruct((bp, d), jnp.float32),   # z
        jax.ShapeDtypeStruct((bp, k), jnp.float32),   # y
        jax.ShapeDtypeStruct((bp, 8), jnp.float32),   # packed scalars
        jax.ShapeDtypeStruct((bp, k), jnp.float32),   # g residual
        jax.ShapeDtypeStruct((bp, d), jnp.float32),   # eps residual
    )
    out_specs = (tile(tb, d), tile(tb, k), tile(tb, 8),
                 tile(tb, k), tile(tb, d))

    kernel = functools.partial(_kernel, hard=hard,
                               in_kernel_prng=in_kernel_prng)
    z, y, scal, g, eps = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem,
                  tile(tb, k), tile(tb, k, d), tile(tb, k, d),
                  full(1, k), full(k, d), full(k, d),
                  tile(tb, k), tile(tb, d)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed.reshape(1, 1), tau.reshape(1, 1).astype(jnp.float32),
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
def _fused_head(seed_f, tau, k_logits, q_means, q_logvars,
                pi_logits, p_means, p_logvars, noise,
                hard: bool, in_kernel_prng: bool, interpret: bool):
    g_in, eps_in = noise
    z, y, scal, g, eps = _fused_forward(
        seed_f, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
        p_logvars, g_in, eps_in, hard, in_kernel_prng, interpret)
    return (z, y, scal[:, 0], scal[:, 1], scal[:, 2], scal[:, 3], scal[:, 4])


def _fused_head_fwd(seed_f, tau, k_logits, q_means, q_logvars,
                    pi_logits, p_means, p_logvars, noise,
                    hard, in_kernel_prng, interpret):
    g_in, eps_in = noise
    z, y, scal, g, eps = _fused_forward(
        seed_f, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
        p_logvars, g_in, eps_in, hard, in_kernel_prng, interpret)
    res = (g, eps, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
           p_logvars)
    out = (z, y, scal[:, 0], scal[:, 1], scal[:, 2], scal[:, 3], scal[:, 4])
    return out, res


def _fused_head_bwd(hard, in_kernel_prng, interpret, res, cts):
    (g, eps, tau, k_logits, q_means, q_logvars, pi_logits, p_means,
     p_logvars) = res
    _, vjp = jax.vjp(
        lambda kl, qm, qlv, pi, pm, plv: _replay(
            g, eps, kl, qm, qlv, pi, pm, plv, tau, hard),
        k_logits, q_means, q_logvars, pi_logits, p_means, p_logvars)
    d_kl, d_qm, d_qlv, d_pi, d_pm, d_plv = vjp(tuple(cts))
    zeros = jnp.zeros((), jnp.float32)
    return (zeros, jnp.zeros_like(tau), d_kl, d_qm, d_qlv, d_pi, d_pm,
            d_plv, (jnp.zeros_like(g), jnp.zeros_like(eps)))


_fused_head.defvjp(_fused_head_fwd, _fused_head_bwd)


# ---------------------------------------------------------------------------
# public entry: signature-compatible with ops.elbo.mixture_elbo_head
# ---------------------------------------------------------------------------


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

    ``noise_mode='xla'`` draws threefry noise outside the kernel (bit-equal
    to the golden path); ``'tpu'`` uses the in-kernel hardware PRNG seeded
    from ``key``. Default: 'tpu' on TPU, 'xla' elsewhere.
    """
    if noise_mode is None:
        noise_mode = 'tpu' if jax.default_backend() == 'tpu' else 'xla'
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    in_kernel_prng = noise_mode == 'tpu'

    b, k = k_logits.shape
    d = q_means.shape[-1]
    key_g, key_z = jax.random.split(key)
    if in_kernel_prng:
        # fold the threefry key into a per-call 32-bit seed
        seed = jax.random.randint(key_g, (), 0, 2**31 - 1, jnp.int32)
        g_in = jnp.zeros((b, k), jnp.float32)
        eps_in = jnp.zeros((b, d), jnp.float32)
    else:
        seed = jnp.zeros((), jnp.int32)
        g_in = dists.sample_gumbel(key_g, (b, k), jnp.float32)
        eps_in = jax.random.normal(key_z, (b, d), jnp.float32)
    seed_f = jax.lax.bitcast_convert_type(seed, jnp.float32)

    tau = jnp.asarray(tau, jnp.float32)
    z, y, log_prior_mix, log_q_mix, log_p_cond, log_q_cond, kl_cat = (
        _fused_head(seed_f, tau, k_logits, q_means, q_logvars,
                    prior.pi_logits, prior.means, prior.logvars,
                    (g_in, eps_in), hard, in_kernel_prng, interpret))
    return HeadOutputs(z=z, y=y, log_prior_mix=log_prior_mix,
                       log_q_mix=log_q_mix, log_p_cond=log_p_cond,
                       log_q_cond=log_q_cond, kl_cat=kl_cat)
