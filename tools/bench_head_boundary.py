"""Kernel-boundary ablation: fuse the posterior-head matmuls into the
Pallas ELBO kernel, or kill the idea with data (VERDICT r2 next-round #4).

Compares two boundaries for the mixture head, end to end (fwd + bwd + param
update), isolated from the conv/decoder stacks so the boundary effect is
measurable:

  narrow (current, ops/kernels/fused_elbo.py):
      feats --XLA Dense x3--> k_logits/q_means/q_logvars --kernel--> head
      XLA materializes the [B,K]+2x[B,K*D] boundary tensors in HBM on the
      forward AND their cotangents on the backward.

  wide (prototype, this file):
      feats --kernel (in-kernel MXU matmuls + head math)--> head
      The boundary tensors never exist in HBM on the forward; the backward
      REMATERIALIZES them with three XLA matmuls (classic remat: trade
      cheap MXU flops for HBM traffic), then reuses the existing
      hand-derived Pallas backward (fused_elbo_bwd.pallas_bwd) and chains
      the matmul VJPs.

Shapes: the flagship (mnist: H=512, K=10, D=10) and cifar_k20's head
(H=512, K=20, D=128, N=2560 — needs the flat layout extended past
_FLAT_MAX_N; selectors at N=2560 are ~3 MB VMEM). celeba's head
(K=64, D=256, N=16384) is excluded by arithmetic: its mean/logvar weight
matrices alone are 2 x 33.5 MB f32 — they cannot sit in VMEM, so an
in-kernel matmul would need an N-gridded accumulation loop (reimplementing
XLA's matmul pipelining); recorded in PERF.md instead.

    python tools/bench_head_boundary.py            # both shapes, both variants
"""

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmvae_tpu.ops import dists
from gmvae_tpu.ops.elbo import MixturePrior
from gmvae_tpu.ops.kernels import fused_elbo
from gmvae_tpu.ops.kernels.fused_elbo import (LOG2PI, _dot, _pick_tile,
                                              _round_up, _selectors,
                                              _tile_threefry_noise)

# ---------------------------------------------------------------------------
# wide-boundary forward kernel (flat layout, threefry noise)
# ---------------------------------------------------------------------------


def _wide_kernel(key_ref,        # SMEM (1,2) int32
                 tau_ref,        # SMEM (1,1) f32
                 feats_ref,      # VMEM (TB, H)
                 wk_ref,         # VMEM (H, K)
                 bk_ref,         # VMEM (1, K)
                 wm_ref,         # VMEM (H, N)
                 bm_ref,         # VMEM (1, N)
                 wlv_ref,        # VMEM (H, N)
                 blv_ref,        # VMEM (1, N)
                 pi_ref,         # VMEM (1, K)
                 pm_ref,         # VMEM (1, N)
                 plv_ref,        # VMEM (1, N)
                 z_ref, y_ref, scal_ref, kl_out_ref,
                 *, k: int, d: int):
    f32 = jnp.float32
    tb = feats_ref.shape[0]
    feats = feats_ref[:]                                       # (TB, H)
    # ---- the fused posterior-head matmuls (MXU, weights resident in VMEM)
    k_logits = (_dot(feats, wk_ref[:]) + bk_ref[:]).astype(f32)
    qm = (_dot(feats, wm_ref[:]) + bm_ref[:]).astype(f32)      # (TB, N)
    qlv_raw = (_dot(feats, wlv_ref[:]) + blv_ref[:]).astype(f32)
    kl_out_ref[:] = k_logits

    g, eps = _tile_threefry_noise(key_ref, tb, k, d)
    tau = tau_ref[0, 0]
    pert = (k_logits + g) / tau
    pert = pert - jnp.max(pert, axis=-1, keepdims=True)
    ey = jnp.exp(pert)
    y = ey / jnp.sum(ey, axis=-1, keepdims=True)
    y_ref[:] = y

    e, et, p, pt = _selectors(k, d)
    qlv = jnp.clip(qlv_raw, dists.LOGVAR_MIN, dists.LOGVAR_MAX)
    y_exp = _dot(y, e)
    mean = _dot(y_exp * qm, p)
    logvar = _dot(y_exp * qlv, p)
    z = mean + jnp.exp(0.5 * logvar) * eps
    z_ref[:] = z

    z_exp = _dot(z, pt)
    dq = z_exp - qm
    tq = dq * dq * jnp.exp(-qlv) + qlv
    comp_q = -0.5 * (_dot(tq, et) + d * LOG2PI)
    pm = pm_ref[:].astype(f32)
    plv = jnp.clip(plv_ref[:].astype(f32), dists.LOGVAR_MIN,
                   dists.LOGVAR_MAX)
    dp = z_exp - pm
    tp = dp * dp * jnp.exp(-plv) + plv
    comp_p = -0.5 * (_dot(tp, et) + d * LOG2PI)

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

    pmean = _dot(y_exp * pm, p)
    plv_mix = _dot(y_exp * plv, p)
    log_p_cond = -0.5 * jnp.sum(
        jnp.square(z - pmean) * jnp.exp(-plv_mix) + plv_mix + LOG2PI,
        axis=-1)
    log_q_cond = -0.5 * jnp.sum(
        jnp.square(z - mean) * jnp.exp(-logvar) + logvar + LOG2PI, axis=-1)
    qk = jnp.exp(log_qk)
    kl_cat = jnp.sum(qk * (log_qk - log_pi[None, :]), axis=-1)

    scal = jnp.stack([log_prior_mix, log_q_mix, log_p_cond, log_q_cond,
                      kl_cat], axis=-1)
    scal_ref[:] = jnp.concatenate([scal, jnp.zeros((tb, 3), f32)], axis=-1)


@functools.partial(jax.jit, static_argnames=('k', 'd', 'interpret'))
def _wide_forward(key_f, tau, feats, wk, bk, wm, bm, wlv, blv,
                  pi_logits, p_means, p_logvars, k: int, d: int,
                  interpret: bool):
    key_i = jax.lax.bitcast_convert_type(key_f, jnp.int32).reshape(1, 2)
    b, h = feats.shape
    n = k * d
    bp = _round_up(b, 8)
    if bp != b:
        feats = jnp.pad(feats, ((0, bp - b), (0, 0)))
    # VMEM working set: selectors (~2 N (K+D) f32) + weights (H(K+2N)) +
    # ~6 live (TB, N) temporaries; solve for TB within the same 6 MB budget
    # _pick_tile uses, charging the fixed weight/selector residency first
    fixed = 4 * (2 * n * (k + d) + h * (k + 2 * n) + 3 * n + 2 * k)
    budget = max(1 << 20, 6 * 1024 * 1024 - fixed)
    per_row = 4 * (6 * n + 2 * h)
    tb = max(8, min(512, budget // per_row)) // 8 * 8
    while bp % tb:
        tb -= 8
    tb = max(tb, 8)
    grid = (bp // tb,)

    tile = lambda *s: pl.BlockSpec(s, lambda i: (i,) + (0,) * (len(s) - 1),
                                   memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    smem = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(_wide_kernel, k=k, d=d),
        grid=grid,
        in_specs=[smem(1, 2), smem(1, 1), tile(tb, h),
                  full(h, k), full(1, k), full(h, n), full(1, n),
                  full(h, n), full(1, n),
                  full(1, k), full(1, n), full(1, n)],
        out_specs=(tile(tb, d), tile(tb, k), tile(tb, 8), tile(tb, k)),
        out_shape=(jax.ShapeDtypeStruct((bp, d), jnp.float32),
                   jax.ShapeDtypeStruct((bp, k), jnp.float32),
                   jax.ShapeDtypeStruct((bp, 8), jnp.float32),
                   jax.ShapeDtypeStruct((bp, k), jnp.float32)),
        interpret=interpret,
    )(key_i, tau.reshape(1, 1).astype(jnp.float32), feats,
      wk, bk.reshape(1, k), wm, bm.reshape(1, n), wlv, blv.reshape(1, n),
      pi_logits.reshape(1, k), p_means.reshape(1, n),
      p_logvars.reshape(1, n))
    return tuple(a[:b] for a in outs) if bp != b else outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def wide_head(key_f, tau, feats, wk, bk, wm, bm, wlv, blv,
              pi_logits, p_means, p_logvars, k, d, interpret):
    z, y, scal, k_logits = _wide_forward(
        key_f, tau, feats, wk, bk, wm, bm, wlv, blv, pi_logits, p_means,
        p_logvars, k, d, interpret)
    return z, y, scal, k_logits


def _wide_fwd(key_f, tau, feats, wk, bk, wm, bm, wlv, blv,
              pi_logits, p_means, p_logvars, k, d, interpret):
    out = _wide_forward(key_f, tau, feats, wk, bk, wm, bm, wlv, blv,
                        pi_logits, p_means, p_logvars, k, d, interpret)
    res = (key_f, tau, feats, wk, bk, wm, bm, wlv, blv, pi_logits,
           p_means, p_logvars)
    return out, res


def _wide_bwd(k, d, interpret, res, cts):
    (key_f, tau, feats, wk, bk, wm, bm, wlv, blv, pi_logits, p_means,
     p_logvars) = res
    cz, cy, cscal, ckl_direct = cts
    b = feats.shape[0]
    # REMATERIALIZE the boundary tensors (three MXU matmuls instead of HBM
    # residual round-trips)
    k_logits = feats @ wk + bk
    q_means = (feats @ wm + bm).reshape(b, k, d)
    q_logvars = (feats @ wlv + blv).reshape(b, k, d)
    from gmvae_tpu.ops.kernels import fused_elbo_bwd
    head_cts = (cz, cy, cscal[:, 0], cscal[:, 1], cscal[:, 2], cscal[:, 3],
                cscal[:, 4])
    d_kl, d_qm, d_qlv, d_pi, d_pm, d_plv = fused_elbo_bwd.pallas_bwd(
        None, None, k_logits, q_means, q_logvars, pi_logits,
        p_means.reshape(k, d), p_logvars.reshape(k, d), tau,
        head_cts, hard=False, interpret=interpret, key_f=key_f)
    d_kl = d_kl + ckl_direct
    d_qm2 = d_qm.reshape(b, k * d)
    d_qlv2 = d_qlv.reshape(b, k * d)
    # chain the matmul VJPs
    d_feats = d_kl @ wk.T + d_qm2 @ wm.T + d_qlv2 @ wlv.T
    d_wk = feats.T @ d_kl
    d_wm = feats.T @ d_qm2
    d_wlv = feats.T @ d_qlv2
    return (jnp.zeros_like(key_f), jnp.zeros_like(tau), d_feats,
            d_wk, d_kl.sum(0), d_wm, d_qm2.sum(0), d_wlv, d_qlv2.sum(0),
            d_pi, d_pm.reshape(-1), d_plv.reshape(-1))


wide_head.defvjp(_wide_fwd, _wide_bwd)


# ---------------------------------------------------------------------------
# benchmark: head-only training loop at config shapes
# ---------------------------------------------------------------------------


def make_params(key, h, k, d, dtype=jnp.float32):
    n = k * d
    ks = jax.random.split(key, 4)
    return {
        'wk': jax.random.normal(ks[0], (h, k), dtype) * 0.05,
        'bk': jnp.zeros((k,), dtype),
        'wm': jax.random.normal(ks[1], (h, n), dtype) * 0.05,
        'bm': jnp.zeros((n,), dtype),
        'wlv': jnp.zeros((h, n), dtype),
        'blv': jnp.zeros((n,), dtype),
        'pi': jnp.zeros((k,), dtype),
        'pm': jax.random.normal(ks[2], (n,), dtype),
        'plv': jnp.zeros((n,), dtype),
    }


def head_loss_narrow(params, feats, key, tau, k, d):
    b = feats.shape[0]
    k_logits = feats @ params['wk'] + params['bk']
    q_means = (feats @ params['wm'] + params['bm']).reshape(b, k, d)
    q_logvars = (feats @ params['wlv'] + params['blv']).reshape(b, k, d)
    prior = MixturePrior(params['pi'], params['pm'].reshape(k, d),
                         params['plv'].reshape(k, d))
    out = fused_elbo.fused_mixture_elbo(key, k_logits, q_means, q_logvars,
                                        prior, tau, noise_mode='threefry',
                                        interpret=False)
    # structured-ELBO-like scalar touching every output + z (stands in for
    # the decoder's gradient into z)
    return jnp.mean(out.log_p_cond - out.log_q_cond - out.kl_cat
                    + jnp.sum(out.z, -1) + 0.01 * jnp.sum(out.y, -1))


def head_loss_wide(params, feats, key, tau, k, d):
    key_f = jax.lax.bitcast_convert_type(jax.random.key_data(key),
                                         jnp.float32)
    z, y, scal, k_logits = wide_head(
        key_f, tau, feats, params['wk'], params['bk'], params['wm'],
        params['bm'], params['wlv'], params['blv'], params['pi'],
        params['pm'], params['plv'], k, d, False)
    return jnp.mean(scal[:, 2] - scal[:, 3] - scal[:, 4]
                    + jnp.sum(z, -1) + 0.01 * jnp.sum(y, -1))


def bench(loss_fn, h, k, d, b, steps=300, inner=100):
    key = jax.random.PRNGKey(0)
    params = make_params(key, h, k, d)
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, h))

    @jax.jit
    def chunk(params, feats, key0):
        def body(carry, i):
            p = carry
            kk = jax.random.fold_in(key0, i)
            loss, grads = jax.value_and_grad(
                lambda q: loss_fn(q, feats, kk, jnp.float32(1.0), k, d)
            )(p)
            p = jax.tree.map(lambda a, g: a - 1e-4 * g, p, grads)
            return p, loss
        return jax.lax.scan(body, params, jnp.arange(inner))

    params, losses = chunk(params, feats, key)          # compile + warm
    float(np.asarray(losses[-1]))
    t0 = time.perf_counter()
    n_chunks = max(1, steps // inner)
    for _ in range(n_chunks):
        params, losses = chunk(params, feats, key)
    last = float(np.asarray(losses[-1]))
    dt = time.perf_counter() - t0
    return n_chunks * inner * b / dt, last


def check_parity(h, k, d, b):
    """wide and narrow draw IDENTICAL counter-based threefry noise, so with
    equal weights their heads must agree to float tolerance."""
    params = make_params(jax.random.PRNGKey(0), h, k, d)
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, h))
    key = jax.random.PRNGKey(7)
    tau = jnp.float32(1.0)
    k_logits = feats @ params['wk'] + params['bk']
    q_means = (feats @ params['wm'] + params['bm']).reshape(b, k, d)
    q_logvars = (feats @ params['wlv'] + params['blv']).reshape(b, k, d)
    prior = MixturePrior(params['pi'], params['pm'].reshape(k, d),
                         params['plv'].reshape(k, d))
    nar = fused_elbo.fused_mixture_elbo(key, k_logits, q_means, q_logvars,
                                        prior, tau, noise_mode='threefry',
                                        interpret=False)
    key_f = jax.lax.bitcast_convert_type(jax.random.key_data(key),
                                         jnp.float32)
    z, y, scal, klo = wide_head(
        key_f, tau, feats, params['wk'], params['bk'], params['wm'],
        params['bm'], params['wlv'], params['blv'], params['pi'],
        params['pm'], params['plv'], k, d, False)
    errs = {
        'z': float(jnp.max(jnp.abs(z - nar.z))),
        'y': float(jnp.max(jnp.abs(y - nar.y))),
        'lpc': float(jnp.max(jnp.abs(scal[:, 2] - nar.log_p_cond))),
        'klc': float(jnp.max(jnp.abs(scal[:, 4] - nar.kl_cat))),
        'k_logits': float(jnp.max(jnp.abs(klo - k_logits))),
    }
    return errs


def main():
    shapes = [('mnist_head', 512, 10, 10, 128),
              ('cifar_head', 512, 20, 128, 128)]
    if len(sys.argv) > 1:
        shapes = [s for s in shapes if s[0] in sys.argv[1:]]
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    for name, h, k, d, b in shapes:
        row = {'shape': name, 'H': h, 'K': k, 'D': d, 'batch': b}
        try:
            errs = check_parity(h, k, d, b)
            row['parity_max_abs_err'] = max(errs.values())
            row['parity_detail'] = errs
        except Exception as e:
            row['parity_error'] = f'{type(e).__name__}: {e}'[:300]
        for variant, fn in (('narrow', head_loss_narrow),
                            ('wide', head_loss_wide)):
            try:
                ips, last = bench(fn, h, k, d, b)
                row[variant + '_img_per_sec'] = round(ips, 1)
                row[variant + '_final_loss'] = round(last, 4)
            except Exception as e:  # record, don't die — this is an ablation
                row[variant + '_error'] = f'{type(e).__name__}: {e}'[:300]
        a, w = row.get('narrow_img_per_sec'), row.get('wide_img_per_sec')
        if a and w:
            row['wide_speedup_pct'] = round(100 * (w / a - 1), 2)
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
