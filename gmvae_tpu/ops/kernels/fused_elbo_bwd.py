"""Hand-derived backward pass for the fused mixture-ELBO head.

SURVEY.md §7.3 hard part #1: "The fused Pallas kernel's backward pass —
hand-managing residuals for custom_vjp, PRNG bits replayable." The noise is
regenerated on-chip from (key, element counter) in threefry mode — no noise
residuals at all — or taken from the caller's streamed-in arrays in xla
mode; this module derives the full chain rule analytically so the backward
is ONE Pallas kernel instead of an XLA re-differentiation of the replay.

``manual_bwd`` is the jnp statement of the math — validated against
``jax.vjp`` of ``ops.elbo.head_from_noise`` bit-for-intent in
tests/test_kernel_bwd.py — and ``fused_elbo_bwd`` (ops/kernels/fused_elbo.py
wires it in) is the same code lowered through Mosaic.

Derivation sketch (per batch row; K components, D latent dims):
  y    = softmax((kl + g)/tau)        (+ straight-through hard selection)
  mean = y.qm ; lv = y.qlv* ; z = mean + e^{lv/2} eps
  comp_q[k] = logN(z; qm_k, qlv*_k) ; comp_p[k] = logN(z; pm_k, plv*_k)
  lqm  = LSE_k(log_qk + comp_q) ; lpm = LSE_k(log_pi + comp_p)
  lqc  = logN(z; mean, lv) ; lpc = logN(z; y.pm, y.plv*)
  klc  = sum_k qk (log_qk - log_pi)
Cotangents flow back through: the two LSEs (responsibility-weighted), the
four diag-Gaussian densities, the y-mixing outer products, the
reparameterized sample, the straight-through softmax, and the two
log-softmaxes. Clamped logvars pass gradient only inside the clamp band.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (specs below)

from gmvae_tpu.ops import dists

LOG2PI = math.log(2.0 * math.pi)


class BwdGrads(NamedTuple):
    d_k_logits: jax.Array   # [B, K]
    d_q_means: jax.Array    # [B, K, D]
    d_q_logvars: jax.Array  # [B, K, D]
    d_pi: jax.Array         # [K]
    d_p_means: jax.Array    # [K, D]
    d_p_logvars: jax.Array  # [K, D]


def manual_bwd(g, eps, k_logits, q_means, q_logvars, pi_logits, p_means,
               p_logvars, tau, cts, hard: bool = False) -> BwdGrads:
    """Analytic VJP of ``ops.elbo.head_from_noise``.

    Args:
      g, eps: the noise the forward actually used (kernel residuals).
      cts: cotangents ``(cz, cy, c_lpm, c_lqm, c_lpc, c_lqc, c_klc)`` with
           shapes ([B,D], [B,K], [B], [B], [B], [B], [B]).
    Returns gradients for the six differentiable inputs (prior grads are
    batch-summed, matching jax.vjp).
    """
    f32 = jnp.float32
    cz, cy, c_lpm, c_lqm, c_lpc, c_lqc, c_klc = [c.astype(f32) for c in cts]

    # ---- recompute the forward intermediates (cheap, elementwise) -------
    qlv_in = q_logvars
    plv_in = p_logvars
    qlv = jnp.clip(qlv_in, dists.LOGVAR_MIN, dists.LOGVAR_MAX)   # [B,K,D]
    plv = jnp.clip(plv_in, dists.LOGVAR_MIN, dists.LOGVAR_MAX)   # [K,D]
    qlv_mask = ((qlv_in >= dists.LOGVAR_MIN)
                & (qlv_in <= dists.LOGVAR_MAX)).astype(f32)
    plv_mask = ((plv_in >= dists.LOGVAR_MIN)
                & (plv_in <= dists.LOGVAR_MAX)).astype(f32)

    s = (k_logits + g) / tau
    ysoft = jax.nn.softmax(s, axis=-1)                           # [B,K]
    if hard:
        k_sel = jnp.argmax(ysoft, axis=-1)
        y = jax.nn.one_hot(k_sel, k_logits.shape[-1], dtype=f32)
    else:
        y = ysoft

    y3 = y[:, :, None]
    mean = jnp.sum(y3 * q_means, axis=1)                          # [B,D]
    lv = jnp.sum(y3 * qlv, axis=1)                                # [B,D]
    z = mean + jnp.exp(0.5 * lv) * eps                            # [B,D]

    pmean = jnp.sum(y3 * p_means[None], axis=1)                   # [B,D]
    pl = jnp.sum(y3 * plv[None], axis=1)                          # [B,D]

    eq = jnp.exp(-qlv)                                            # [B,K,D]
    ep = jnp.exp(-plv)[None]                                      # [1,K,D]
    dq = z[:, None, :] - q_means                                  # [B,K,D]
    dp = z[:, None, :] - p_means[None]                            # [B,K,D]

    comp_q = -0.5 * jnp.sum(dq * dq * eq + qlv + LOG2PI, axis=-1)  # [B,K]
    comp_p = -0.5 * jnp.sum(dp * dp * ep + plv[None] + LOG2PI,
                            axis=-1)                               # [B,K]

    log_pi = jax.nn.log_softmax(pi_logits)                        # [K]
    pi_sm = jnp.exp(log_pi)                                       # [K]
    log_qk = jax.nn.log_softmax(k_logits, axis=-1)                # [B,K]
    qk = jnp.exp(log_qk)                                          # [B,K]

    w_p = jax.nn.softmax(log_pi[None] + comp_p, axis=-1)          # [B,K]
    w_q = jax.nn.softmax(log_qk + comp_q, axis=-1)                # [B,K]

    # ---- accumulators ----------------------------------------------------
    d_z = cz
    d_y = cy
    d_kl = jnp.zeros_like(k_logits)
    d_qm = jnp.zeros_like(q_means)
    d_qlv = jnp.zeros_like(q_means)   # wrt clamped qlv; mask at the end
    d_pi = jnp.zeros_like(pi_logits)
    d_pm_b = jnp.zeros_like(q_means)  # per-batch [B,K,D]; summed at the end
    d_plv_b = jnp.zeros_like(q_means)
    d_mean = jnp.zeros_like(mean)
    d_lv = jnp.zeros_like(lv)

    # A. klc = sum_k qk (log_qk - log_pi):
    #    d/dkl_j = qk_j [(log_qk_j - log_pi_j) - klc]
    #    d/dpi_j = pi_j - qk_j        (through log_softmax(pi))
    klc_val = jnp.sum(qk * (log_qk - log_pi[None]), axis=-1,
                      keepdims=True)                               # [B,1]
    d_kl += c_klc[:, None] * qk * ((log_qk - log_pi[None]) - klc_val)
    d_pi += jnp.sum(c_klc[:, None] * (pi_sm[None] - qk), axis=0)

    # B. lqc = logN(z; mean, lv)
    e_lv = jnp.exp(-lv)
    r_q = (z - mean) * e_lv                                       # [B,D]
    d_z += c_lqc[:, None] * (-r_q)
    d_mean += c_lqc[:, None] * r_q
    d_lv += c_lqc[:, None] * 0.5 * ((z - mean) * r_q - 1.0)

    # C. lpc = logN(z; pmean, pl)
    e_pl = jnp.exp(-pl)
    r_p = (z - pmean) * e_pl
    d_z += c_lpc[:, None] * (-r_p)
    d_pmean = c_lpc[:, None] * r_p                                # [B,D]
    d_pl = c_lpc[:, None] * 0.5 * ((z - pmean) * r_p - 1.0)       # [B,D]
    d_pm_b += y3 * d_pmean[:, None, :]
    d_y += jnp.sum(p_means[None] * d_pmean[:, None, :], axis=-1)
    d_plv_b += y3 * d_pl[:, None, :]
    d_y += jnp.sum(plv[None] * d_pl[:, None, :], axis=-1)

    # D/E. the two LSEs
    a_q = c_lqm[:, None] * w_q                                    # [B,K]
    a_p = c_lpm[:, None] * w_p                                    # [B,K]
    d_log_qk = a_q
    d_pi += jnp.sum(c_lpm[:, None] * (w_p - pi_sm[None]), axis=0)

    # F. comp_q backward (coefficients a_q)
    dqe = dq * eq                                                 # [B,K,D]
    d_z += jnp.sum(a_q[:, :, None] * (-dqe), axis=1)
    d_qm += a_q[:, :, None] * dqe
    d_qlv += a_q[:, :, None] * 0.5 * (dq * dqe - 1.0)

    # G. comp_p backward (coefficients a_p)
    dpe = dp * ep
    d_z += jnp.sum(a_p[:, :, None] * (-dpe), axis=1)
    d_pm_b += a_p[:, :, None] * dpe
    d_plv_b += a_p[:, :, None] * 0.5 * (dp * dpe - 1.0)

    # H. z = mean + e^{lv/2} eps  (d_z is now fully accumulated)
    d_mean += d_z
    d_lv += d_z * 0.5 * jnp.exp(0.5 * lv) * eps

    # I. mean/lv mixing
    d_qm += y3 * d_mean[:, None, :]
    d_y += jnp.sum(q_means * d_mean[:, None, :], axis=-1)
    d_qlv += y3 * d_lv[:, None, :]
    d_y += jnp.sum(qlv * d_lv[:, None, :], axis=-1)

    # J. softmax (straight-through passes d_y unchanged to ysoft)
    d_s = (d_y - jnp.sum(d_y * ysoft, axis=-1, keepdims=True)) * ysoft
    d_kl += d_s / tau

    # K. log_qk = log_softmax(kl)
    d_kl += d_log_qk - qk * jnp.sum(d_log_qk, axis=-1, keepdims=True)

    # M/N. clamp masks + batch reduction for prior grads
    d_qlv = d_qlv * qlv_mask
    d_pm = jnp.sum(d_pm_b, axis=0)
    d_plv = jnp.sum(d_plv_b, axis=0) * plv_mask

    return BwdGrads(d_kl, d_qm, d_qlv, d_pi, d_pm, d_plv)


# ---------------------------------------------------------------------------
# Pallas kernel: the identical math, tile-local, with cross-tile
# accumulation of the batch-summed prior gradients (the TPU grid executes
# sequentially, so revisiting the same output block is an accumulator).
# ---------------------------------------------------------------------------


def _split_bwd_io(rest, key_ref, regen: bool):
    """Shared ``*rest`` unpacking + noise for both backward layouts: [not
    regen: g, eps], then kl qm qlv pi pm plv cz cy cs + 6 grad outputs.
    In regen (threefry) mode the forward's EXACT noise is regenerated
    on-chip from (key, global element index) — no HBM noise residuals.
    The layout lives ONLY here: tile shape derives from the unpacked
    kl (TB,K) / cz (TB,D) refs, identical in both layouts."""
    from gmvae_tpu.ops.kernels.fused_elbo import _tile_threefry_noise
    refs = list(rest)
    if not regen:
        g_ref, eps_ref = refs[:2]
        refs = refs[2:]
    kl_ref, cz_ref = refs[0], refs[6]
    tb, k = kl_ref.shape
    d = cz_ref.shape[-1]
    if regen:
        g, eps = _tile_threefry_noise(key_ref, tb, k, d)
    else:
        g, eps = g_ref[:], eps_ref[:]
    return g, eps, refs


def _bwd_kernel(tau_ref,                               # SMEM (1,1)
                key_ref,                               # SMEM (1,2) int32
                *rest,                                 # [not regen: g (TB,K),
                                                       #  eps (TB,D)], then:
                                                       # kl qm qlv pi pm plv
                                                       # cz cy cs + 6 outputs
                hard: bool, regen: bool):
    g, eps, refs = _split_bwd_io(rest, key_ref, regen)
    (kl_ref, qm_ref, qlv_ref, pi_ref, pm_ref, plv_ref,
     cz_ref, cy_ref, cs_ref,
     d_kl_ref, d_qm_ref, d_qlv_ref, d_pi_ref, d_pm_ref, d_plv_ref) = refs

    f32 = jnp.float32
    tb, k = kl_ref.shape
    d = cz_ref.shape[-1]
    tau = tau_ref[0, 0]
    k_logits = kl_ref[:].astype(f32)
    q_means = qm_ref[:].astype(f32)
    qlv_in = qlv_ref[:].astype(f32)
    pi_logits = pi_ref[0, :].astype(f32)
    p_means = pm_ref[:].astype(f32)
    plv_in = plv_ref[:].astype(f32)
    cz = cz_ref[:]
    cy = cy_ref[:]
    # packed per-sample cotangents: [lpm, lqm, lpc, lqc, klc, 0, 0, 0]
    c_lpm = cs_ref[:, 0:1]
    c_lqm = cs_ref[:, 1:2]
    c_lpc = cs_ref[:, 2:3]
    c_lqc = cs_ref[:, 3:4]
    c_klc = cs_ref[:, 4:5]

    qlv = jnp.clip(qlv_in, dists.LOGVAR_MIN, dists.LOGVAR_MAX)
    plv = jnp.clip(plv_in, dists.LOGVAR_MIN, dists.LOGVAR_MAX)
    qlv_mask = ((qlv_in >= dists.LOGVAR_MIN)
                & (qlv_in <= dists.LOGVAR_MAX)).astype(f32)
    plv_mask = ((plv_in >= dists.LOGVAR_MIN)
                & (plv_in <= dists.LOGVAR_MAX)).astype(f32)

    s = (k_logits + g) / tau
    s = s - jnp.max(s, axis=-1, keepdims=True)
    es = jnp.exp(s)
    ysoft = es / jnp.sum(es, axis=-1, keepdims=True)
    if hard:
        am = jnp.argmax(ysoft, axis=-1)
        col = jax.lax.broadcasted_iota(jnp.int32, (tb, k), 1)
        y = jnp.where(col == am[:, None], f32(1.0), f32(0.0))
    else:
        y = ysoft

    y3 = y[:, :, None]
    mean = jnp.sum(y3 * q_means, axis=1)
    lv = jnp.sum(y3 * qlv, axis=1)
    z = mean + jnp.exp(0.5 * lv) * eps
    pmean = jnp.sum(y3 * p_means[None], axis=1)
    pl_mix = jnp.sum(y3 * plv[None], axis=1)

    eq = jnp.exp(-qlv)
    ep = jnp.exp(-plv)[None]
    dq = z[:, None, :] - q_means
    dp = z[:, None, :] - p_means[None]
    comp_q = -0.5 * jnp.sum(dq * dq * eq + qlv + LOG2PI, axis=-1)
    comp_p = -0.5 * jnp.sum(dp * dp * ep + plv[None] + LOG2PI, axis=-1)

    log_pi = pi_logits - jax.nn.logsumexp(pi_logits)
    pi_sm = jnp.exp(log_pi)
    log_qk = k_logits - jax.nn.logsumexp(k_logits, axis=-1, keepdims=True)
    qk = jnp.exp(log_qk)

    ap_l = log_pi[None] + comp_p
    ap_l = ap_l - jnp.max(ap_l, axis=-1, keepdims=True)
    e_ap = jnp.exp(ap_l)
    w_p = e_ap / jnp.sum(e_ap, axis=-1, keepdims=True)
    aq_l = log_qk + comp_q
    aq_l = aq_l - jnp.max(aq_l, axis=-1, keepdims=True)
    e_aq = jnp.exp(aq_l)
    w_q = e_aq / jnp.sum(e_aq, axis=-1, keepdims=True)

    d_z = cz
    d_y = cy
    d_kl = jnp.zeros((tb, k), f32)
    d_qm = jnp.zeros((tb, k, d), f32)
    d_qlv = jnp.zeros((tb, k, d), f32)
    d_pi_t = jnp.zeros((k,), f32)
    d_pm_b = jnp.zeros((tb, k, d), f32)
    d_plv_b = jnp.zeros((tb, k, d), f32)
    d_mean = jnp.zeros((tb, d), f32)
    d_lv = jnp.zeros((tb, d), f32)

    # A. klc
    klc_val = jnp.sum(qk * (log_qk - log_pi[None]), axis=-1, keepdims=True)
    d_kl += c_klc * qk * ((log_qk - log_pi[None]) - klc_val)
    d_pi_t += jnp.sum(c_klc * (pi_sm[None] - qk), axis=0)

    # B. lqc
    e_lv = jnp.exp(-lv)
    r_q = (z - mean) * e_lv
    d_z += c_lqc * (-r_q)
    d_mean += c_lqc * r_q
    d_lv += c_lqc * 0.5 * ((z - mean) * r_q - 1.0)

    # C. lpc
    e_pl = jnp.exp(-pl_mix)
    r_p = (z - pmean) * e_pl
    d_z += c_lpc * (-r_p)
    d_pmean = c_lpc * r_p
    d_pl = c_lpc * 0.5 * ((z - pmean) * r_p - 1.0)
    d_pm_b += y3 * d_pmean[:, None, :]
    d_y += jnp.sum(p_means[None] * d_pmean[:, None, :], axis=-1)
    d_plv_b += y3 * d_pl[:, None, :]
    d_y += jnp.sum(plv[None] * d_pl[:, None, :], axis=-1)

    # D/E. the two LSEs
    a_q = c_lqm * w_q
    a_p = c_lpm * w_p
    d_log_qk = a_q
    d_pi_t += jnp.sum(c_lpm * (w_p - pi_sm[None]), axis=0)

    # F. comp_q
    dqe = dq * eq
    d_z += jnp.sum(a_q[:, :, None] * (-dqe), axis=1)
    d_qm += a_q[:, :, None] * dqe
    d_qlv += a_q[:, :, None] * 0.5 * (dq * dqe - 1.0)

    # G. comp_p
    dpe = dp * ep
    d_z += jnp.sum(a_p[:, :, None] * (-dpe), axis=1)
    d_pm_b += a_p[:, :, None] * dpe
    d_plv_b += a_p[:, :, None] * 0.5 * (dp * dpe - 1.0)

    # H. z = mean + e^{lv/2} eps
    d_mean += d_z
    d_lv += d_z * 0.5 * jnp.exp(0.5 * lv) * eps

    # I. mixing
    d_qm += y3 * d_mean[:, None, :]
    d_y += jnp.sum(q_means * d_mean[:, None, :], axis=-1)
    d_qlv += y3 * d_lv[:, None, :]
    d_y += jnp.sum(qlv * d_lv[:, None, :], axis=-1)

    # J. straight-through softmax
    d_s = (d_y - jnp.sum(d_y * ysoft, axis=-1, keepdims=True)) * ysoft
    d_kl += d_s / tau

    # K. log_softmax(kl)
    d_kl += d_log_qk - qk * jnp.sum(d_log_qk, axis=-1, keepdims=True)

    # write tiled grads
    d_kl_ref[:] = d_kl
    d_qm_ref[:] = d_qm
    d_qlv_ref[:] = d_qlv * qlv_mask

    # accumulate batch-summed prior grads across sequential grid steps
    @pl.when(pl.program_id(0) == 0)
    def _init():
        d_pi_ref[:] = jnp.zeros_like(d_pi_ref)
        d_pm_ref[:] = jnp.zeros_like(d_pm_ref)
        d_plv_ref[:] = jnp.zeros_like(d_plv_ref)

    d_pi_ref[:] = d_pi_ref[:] + d_pi_t.reshape(1, k)
    d_pm_ref[:] = d_pm_ref[:] + jnp.sum(d_pm_b, axis=0)
    d_plv_ref[:] = d_plv_ref[:] + jnp.sum(d_plv_b, axis=0) * plv_mask


def _bwd_kernel_flat(tau_ref,                          # SMEM (1,1)
                     key_ref,                          # SMEM (1,2) int32
                     *rest, k: int, d: int, hard: bool, regen: bool):
    """Flat-layout backward: the same chain rule as ``_bwd_kernel`` with
    every [TB,K,D] tensor as (TB, N=K*D) and the K/D reductions as
    selector matmuls (see fused_elbo._kernel_flat)."""
    from gmvae_tpu.ops.kernels.fused_elbo import _dot, _selectors
    g, eps, refs = _split_bwd_io(rest, key_ref, regen)
    (kl_ref, qm_ref, qlv_ref, pi_ref, pm_ref, plv_ref,
     cz_ref, cy_ref, cs_ref,
     d_kl_ref, d_qm_ref, d_qlv_ref, d_pi_ref, d_pm_ref, d_plv_ref) = refs

    f32 = jnp.float32
    tb = kl_ref.shape[0]
    tau = tau_ref[0, 0]
    k_logits = kl_ref[:].astype(f32)
    qm = qm_ref[:].astype(f32)                                # (TB, N)
    qlv_in = qlv_ref[:].astype(f32)
    pi_logits = pi_ref[0, :].astype(f32)
    pm = pm_ref[:].astype(f32)                                # (1, N)
    plv_in = plv_ref[:].astype(f32)                           # (1, N)
    cz = cz_ref[:]
    cy = cy_ref[:]
    c_lpm = cs_ref[:, 0:1]
    c_lqm = cs_ref[:, 1:2]
    c_lpc = cs_ref[:, 2:3]
    c_lqc = cs_ref[:, 3:4]
    c_klc = cs_ref[:, 4:5]

    e, et, p, pt = _selectors(k, d)

    qlv = jnp.clip(qlv_in, dists.LOGVAR_MIN, dists.LOGVAR_MAX)
    plv = jnp.clip(plv_in, dists.LOGVAR_MIN, dists.LOGVAR_MAX)
    qlv_mask = ((qlv_in >= dists.LOGVAR_MIN)
                & (qlv_in <= dists.LOGVAR_MAX)).astype(f32)
    plv_mask = ((plv_in >= dists.LOGVAR_MIN)
                & (plv_in <= dists.LOGVAR_MAX)).astype(f32)

    s = (k_logits + g) / tau
    s = s - jnp.max(s, axis=-1, keepdims=True)
    es = jnp.exp(s)
    ysoft = es / jnp.sum(es, axis=-1, keepdims=True)
    if hard:
        am = jnp.argmax(ysoft, axis=-1)
        col = jax.lax.broadcasted_iota(jnp.int32, (tb, k), 1)
        y = jnp.where(col == am[:, None], f32(1.0), f32(0.0))
    else:
        y = ysoft

    y_exp = _dot(y, e)                                        # (TB, N)
    mean = _dot(y_exp * qm, p)                                # (TB, D)
    lv = _dot(y_exp * qlv, p)
    z = mean + jnp.exp(0.5 * lv) * eps
    pmean = _dot(y_exp * pm, p)
    pl_mix = _dot(y_exp * plv, p)

    z_exp = _dot(z, pt)                                       # (TB, N)
    eq = jnp.exp(-qlv)
    ep = jnp.exp(-plv)                                        # (1, N)
    dq = z_exp - qm
    dp = z_exp - pm
    comp_q = -0.5 * (_dot(dq * dq * eq + qlv, et) + d * LOG2PI)
    comp_p = -0.5 * (_dot(dp * dp * ep + plv, et) + d * LOG2PI)

    log_pi = pi_logits - jax.nn.logsumexp(pi_logits)
    pi_sm = jnp.exp(log_pi)
    log_qk = k_logits - jax.nn.logsumexp(k_logits, axis=-1, keepdims=True)
    qk = jnp.exp(log_qk)

    ap_l = log_pi[None] + comp_p
    ap_l = ap_l - jnp.max(ap_l, axis=-1, keepdims=True)
    e_ap = jnp.exp(ap_l)
    w_p = e_ap / jnp.sum(e_ap, axis=-1, keepdims=True)
    aq_l = log_qk + comp_q
    aq_l = aq_l - jnp.max(aq_l, axis=-1, keepdims=True)
    e_aq = jnp.exp(aq_l)
    w_q = e_aq / jnp.sum(e_aq, axis=-1, keepdims=True)

    d_z = cz
    d_y = cy
    d_kl = jnp.zeros((tb, k), f32)
    d_qm_acc = jnp.zeros_like(qm)
    d_qlv_acc = jnp.zeros_like(qm)
    d_pi_t = jnp.zeros((k,), f32)
    d_pm_acc = jnp.zeros_like(qm)   # per-batch (TB,N); summed at the end
    d_plv_acc = jnp.zeros_like(qm)
    d_mean = jnp.zeros((tb, d), f32)
    d_lv = jnp.zeros((tb, d), f32)

    # A. klc
    klc_val = jnp.sum(qk * (log_qk - log_pi[None]), axis=-1, keepdims=True)
    d_kl += c_klc * qk * ((log_qk - log_pi[None]) - klc_val)
    d_pi_t += jnp.sum(c_klc * (pi_sm[None] - qk), axis=0)

    # B. lqc
    e_lv = jnp.exp(-lv)
    r_q = (z - mean) * e_lv
    d_z += c_lqc * (-r_q)
    d_mean += c_lqc * r_q
    d_lv += c_lqc * 0.5 * ((z - mean) * r_q - 1.0)

    # C. lpc
    e_pl = jnp.exp(-pl_mix)
    r_p = (z - pmean) * e_pl
    d_z += c_lpc * (-r_p)
    d_pmean_exp = _dot(c_lpc * r_p, pt)                       # (TB, N)
    d_pl_exp = _dot(c_lpc * 0.5 * ((z - pmean) * r_p - 1.0), pt)
    d_pm_acc += y_exp * d_pmean_exp
    d_y += _dot(pm * d_pmean_exp, et)
    d_plv_acc += y_exp * d_pl_exp
    d_y += _dot(plv * d_pl_exp, et)

    # D/E. the two LSEs
    a_q = c_lqm * w_q
    a_p = c_lpm * w_p
    d_log_qk = a_q
    d_pi_t += jnp.sum(c_lpm * (w_p - pi_sm[None]), axis=0)

    # F. comp_q
    a_q_exp = _dot(a_q, e)                                    # (TB, N)
    dqe = dq * eq
    d_z += _dot(a_q_exp * (-dqe), p)
    d_qm_acc += a_q_exp * dqe
    d_qlv_acc += a_q_exp * 0.5 * (dq * dqe - 1.0)

    # G. comp_p
    a_p_exp = _dot(a_p, e)
    dpe = dp * ep
    d_z += _dot(a_p_exp * (-dpe), p)
    d_pm_acc += a_p_exp * dpe
    d_plv_acc += a_p_exp * 0.5 * (dp * dpe - 1.0)

    # H. z = mean + e^{lv/2} eps
    d_mean += d_z
    d_lv += d_z * 0.5 * jnp.exp(0.5 * lv) * eps

    # I. mixing
    d_mean_exp = _dot(d_mean, pt)
    d_lv_exp = _dot(d_lv, pt)
    d_qm_acc += y_exp * d_mean_exp
    d_y += _dot(qm * d_mean_exp, et)
    d_qlv_acc += y_exp * d_lv_exp
    d_y += _dot(qlv * d_lv_exp, et)

    # J. straight-through softmax
    d_s = (d_y - jnp.sum(d_y * ysoft, axis=-1, keepdims=True)) * ysoft
    d_kl += d_s / tau

    # K. log_softmax(kl)
    d_kl += d_log_qk - qk * jnp.sum(d_log_qk, axis=-1, keepdims=True)

    d_kl_ref[:] = d_kl
    d_qm_ref[:] = d_qm_acc
    d_qlv_ref[:] = d_qlv_acc * qlv_mask

    @pl.when(pl.program_id(0) == 0)
    def _init():
        d_pi_ref[:] = jnp.zeros_like(d_pi_ref)
        d_pm_ref[:] = jnp.zeros_like(d_pm_ref)
        d_plv_ref[:] = jnp.zeros_like(d_plv_ref)

    d_pi_ref[:] = d_pi_ref[:] + d_pi_t.reshape(1, k)
    d_pm_ref[:] = d_pm_ref[:] + jnp.sum(d_pm_acc, axis=0, keepdims=True)
    d_plv_ref[:] = d_plv_ref[:] + (jnp.sum(d_plv_acc, axis=0, keepdims=True)
                                   * plv_mask)


def pallas_bwd(g, eps, k_logits, q_means, q_logvars, pi_logits, p_means,
               p_logvars, tau, cts, hard: bool,
               interpret: bool, key_f=None) -> Tuple[jax.Array, ...]:
    """Single-kernel backward. Cotangent layout matches the forward's
    outputs; per-sample scalars are packed into one (B,8) array to mirror
    the forward's packing. Zero rows in the batch padding contribute zero
    gradient (all terms are linear in the cotangents).

    ``g``/``eps`` may be None (threefry mode): the kernel then regenerates
    the forward's exact noise on-chip from ``key_f`` and the element
    counters instead of reading residuals from HBM.
    """
    import functools as _ft

    from jax.experimental import pallas as pl_  # local alias for clarity
    from jax.experimental.pallas import tpu as pltpu_

    regen = g is None
    cz, cy, c_lpm, c_lqm, c_lpc, c_lqc, c_klc = cts
    b, k = k_logits.shape
    d = q_means.shape[-1]
    f32 = jnp.float32
    cs = jnp.stack([c_lpm, c_lqm, c_lpc, c_lqc, c_klc,
                    jnp.zeros_like(c_lpm), jnp.zeros_like(c_lpm),
                    jnp.zeros_like(c_lpm)], axis=-1).astype(f32)   # [B,8]

    bp = -(-b // 8) * 8
    if bp != b:
        padb = lambda a: jnp.pad(a, ((0, bp - b),) + ((0, 0),) * (a.ndim - 1))
        k_logits, q_means, q_logvars, cz, cy, cs = map(
            padb, (k_logits, q_means, q_logvars, cz, cy, cs))
        if not regen:
            g, eps = map(padb, (g, eps))
    from gmvae_tpu.ops.kernels import fused_elbo as _fwd
    # the backward keeps ~15 (TB, K*D) f32 temporaries alive (q/p density
    # terms, their cotangents, and four param-grad accumulators) vs the
    # forward's ~6 — budget the tile accordingly or Mosaic can fail VMEM
    # allocation near the _FLAT_MAX_N ceiling
    tb = _fwd._pick_tile(bp, k, d, copies=15)
    grid = (bp // tb,)

    tile = lambda *shape: pl_.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu_.VMEM)
    full = lambda *shape: pl_.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu_.VMEM)
    smem = lambda *shape: pl_.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu_.SMEM)

    vma = _fwd.vma_union(g, eps, k_logits, q_means, q_logvars, pi_logits,
                         p_means, p_logvars, cz, cy, cs, tau, key_f)
    flat = _fwd.use_flat_layout(k, d)
    n = k * d
    if flat:
        out_shape = (
            jax.ShapeDtypeStruct((bp, k), f32, vma=vma),   # d_kl
            jax.ShapeDtypeStruct((bp, n), f32, vma=vma),   # d_qm (flat)
            jax.ShapeDtypeStruct((bp, n), f32, vma=vma),   # d_qlv (flat)
            jax.ShapeDtypeStruct((1, k), f32, vma=vma),    # d_pi (accum)
            jax.ShapeDtypeStruct((1, n), f32, vma=vma),    # d_pm (accum)
            jax.ShapeDtypeStruct((1, n), f32, vma=vma),    # d_plv (accum)
        )
        out_specs = (tile(tb, k), tile(tb, n), tile(tb, n),
                     full(1, k), full(1, n), full(1, n))
    else:
        out_shape = (
            jax.ShapeDtypeStruct((bp, k), f32, vma=vma),      # d_kl
            jax.ShapeDtypeStruct((bp, k, d), f32, vma=vma),   # d_qm
            jax.ShapeDtypeStruct((bp, k, d), f32, vma=vma),   # d_qlv
            jax.ShapeDtypeStruct((1, k), f32, vma=vma),       # d_pi (accum)
            jax.ShapeDtypeStruct((k, d), f32, vma=vma),       # d_pm (accum)
            jax.ShapeDtypeStruct((k, d), f32, vma=vma),       # d_plv (accum)
        )
        out_specs = (tile(tb, k), tile(tb, k, d), tile(tb, k, d),
                     full(1, k), full(k, d), full(k, d))

    if key_f is None:
        key_i = jnp.zeros((1, 2), jnp.int32)
    else:
        key_i = jax.lax.bitcast_convert_type(key_f, jnp.int32).reshape(1, 2)
    in_specs = [smem(1, 1), smem(1, 2)]
    operands = [jnp.asarray(tau, f32).reshape(1, 1), key_i]
    if not regen:
        in_specs += [tile(tb, k), tile(tb, d)]
        operands += [g, eps]
    if flat:
        in_specs += [tile(tb, k), tile(tb, n), tile(tb, n),
                     full(1, k), full(1, n), full(1, n),
                     tile(tb, d), tile(tb, k), tile(tb, 8)]
        operands += [k_logits, q_means.reshape(bp, n),
                     q_logvars.reshape(bp, n),
                     pi_logits.reshape(1, k), p_means.reshape(1, n),
                     p_logvars.reshape(1, n), cz, cy, cs]
        kernel = _ft.partial(_bwd_kernel_flat, k=k, d=d, hard=hard,
                             regen=regen)
    else:
        in_specs += [tile(tb, k), tile(tb, k, d), tile(tb, k, d),
                     full(1, k), full(k, d), full(k, d),
                     tile(tb, d), tile(tb, k), tile(tb, 8)]
        operands += [k_logits, q_means, q_logvars,
                     pi_logits.reshape(1, k), p_means, p_logvars, cz, cy, cs]
        kernel = _ft.partial(_bwd_kernel, hard=hard, regen=regen)

    d_kl, d_qm, d_qlv, d_pi, d_pm, d_plv = pl_.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if flat:
        d_qm = d_qm.reshape(bp, k, d)
        d_qlv = d_qlv.reshape(bp, k, d)
        d_pm = d_pm.reshape(k, d)
        d_plv = d_plv.reshape(k, d)
    if bp != b:
        d_kl, d_qm, d_qlv = d_kl[:b], d_qm[:b], d_qlv[:b]
    return (d_kl, d_qm, d_qlv, d_pi[0], d_pm, d_plv)
