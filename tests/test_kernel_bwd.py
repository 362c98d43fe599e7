"""Hand-derived backward kernel vs autodiff oracle (SURVEY.md §7.3 #1).

Three layers of defense: (1) the jnp statement of the analytic chain rule
(``manual_bwd``) against ``jax.vjp`` of the shared forward math; (2) the
Pallas kernel (interpret) against ``manual_bwd``; (3) end-to-end gradients
through the full fused head with the kernel backward wired in, against the
jnp golden path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmvae_tpu.ops import elbo as elbo_lib
from gmvae_tpu.ops.kernels import fused_elbo, fused_elbo_bwd


def _problem(b, k, d, seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    kl = jax.random.normal(ks[0], (b, k))
    qm = jax.random.normal(ks[1], (b, k, d))
    qlv = jax.random.uniform(ks[2], (b, k, d), minval=-1, maxval=1)
    pi = jax.random.normal(ks[3], (k,))
    pm = jax.random.normal(ks[4], (k, d))
    plv = jax.random.uniform(ks[5], (k, d), minval=-1, maxval=1)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(ks[6], (b, k), minval=1e-6, maxval=1 - 1e-6)))
    eps = jax.random.normal(ks[7], (b, d))
    cks = jax.random.split(ks[8], 7)
    cts = (jax.random.normal(cks[0], (b, d)),
           jax.random.normal(cks[1], (b, k)),
           *[jax.random.normal(cks[i], (b,)) for i in range(2, 7)])
    return g, eps, kl, qm, qlv, pi, pm, plv, jnp.float32(0.8), cts


@pytest.mark.parametrize('hard', [False, True])
def test_manual_bwd_matches_autodiff(hard):
    g, eps, kl, qm, qlv, pi, pm, plv, tau, cts = _problem(17, 5, 7, 0)

    def fwd(kl, qm, qlv, pi, pm, plv):
        return tuple(elbo_lib.head_from_noise(
            g, eps, kl, qm, qlv, elbo_lib.MixturePrior(pi, pm, plv), tau,
            hard=hard))

    _, vjp = jax.vjp(fwd, kl, qm, qlv, pi, pm, plv)
    want = vjp(cts)
    got = fused_elbo_bwd.manual_bwd(g, eps, kl, qm, qlv, pi, pm, plv, tau,
                                    cts, hard=hard)
    for name, a, b in zip(got._fields, want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize('hard', [False, True])
def test_pallas_bwd_matches_manual(hard):
    args = _problem(40, 3, 4, 3)
    want = fused_elbo_bwd.manual_bwd(*args, hard=hard)
    got = fused_elbo_bwd.pallas_bwd(*args, hard=hard, interpret=True)
    for name, a, b in zip(want._fields, want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_pallas_bwd_matches_manual_3d_layout():
    """d >= 128 keeps the 3-D backward kernel; cover it explicitly now
    that small-d problems auto-select the flat layout."""
    from gmvae_tpu.ops.kernels.fused_elbo import use_flat_layout
    assert not use_flat_layout(3, 128)
    args = _problem(16, 3, 128, 13)
    want = fused_elbo_bwd.manual_bwd(*args)
    got = fused_elbo_bwd.pallas_bwd(*args, hard=False, interpret=True)
    for name, a, b in zip(want._fields, want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_pallas_bwd_handles_batch_padding():
    args = _problem(13, 4, 6, 5)  # 13 pads to 16; pad rows must not leak
    want = fused_elbo_bwd.manual_bwd(*args)
    got = fused_elbo_bwd.pallas_bwd(*args, hard=False, interpret=True)
    for name, a, b in zip(want._fields, want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize('hard', [False, True])
def test_pallas_bwd_threefry_regen_matches_residual_path(hard):
    """Residual-free backward (threefry regen, g/eps=None + key) == the
    residual-fed kernel given the host-replayed noise — the exactness
    contract that lets the fast path skip noise residuals entirely."""
    from gmvae_tpu.ops.kernels import threefry as tf
    b, k, d = 21, 4, 6
    _, _, kl, qm, qlv, pi, pm, plv, tau, cts = _problem(b, k, d, 11)
    key = jax.random.PRNGKey(42)
    key_data = jax.random.key_data(key)
    key_f = jax.lax.bitcast_convert_type(key_data, jnp.float32)
    k0, k1 = key_data[0], key_data[1]
    g = tf.gumbel_from_grid(k0, k1, *tf.host_grid(b, k))
    eps = tf.normal_from_grid(k0, k1, *tf.host_grid(b, d))

    want = fused_elbo_bwd.pallas_bwd(g, eps, kl, qm, qlv, pi, pm, plv, tau,
                                     cts, hard=hard, interpret=True)
    got = fused_elbo_bwd.pallas_bwd(None, None, kl, qm, qlv, pi, pm, plv,
                                    tau, cts, hard=hard, interpret=True,
                                    key_f=key_f)
    for a, b_ in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_end_to_end_gradients_threefry_no_residuals():
    """Full fused head in threefry mode (kernel fwd, regen kernel bwd) ==
    jnp golden path fed the host-replayed threefry noise."""
    from gmvae_tpu.ops.kernels import threefry as tf
    assert fused_elbo.BWD_IMPL == 'pallas'
    b, k, d = 16, 4, 6
    ks = jax.random.split(jax.random.PRNGKey(9), 7)
    kl = jax.random.normal(ks[0], (b, k))
    qm = jax.random.normal(ks[1], (b, k, d))
    qlv = jax.random.uniform(ks[2], (b, k, d), minval=-1, maxval=1)
    prior = elbo_lib.MixturePrior(
        jax.random.normal(ks[3], (k,)),
        jax.random.normal(ks[4], (k, d)),
        jax.random.uniform(ks[5], (k, d), minval=-1, maxval=1))
    key, tau = ks[6], jnp.float32(0.9)
    kd = jax.random.key_data(key)
    g = tf.gumbel_from_grid(kd[0], kd[1], *tf.host_grid(b, k))
    eps = tf.normal_from_grid(kd[0], kd[1], *tf.host_grid(b, d))

    def scalar_loss(h):
        return (0.1 * jnp.sum(h.z) + 0.03 * jnp.sum(h.y)
                + jnp.mean(h.log_prior_mix - h.log_q_mix)
                + jnp.mean(h.log_p_cond - h.log_q_cond)
                - jnp.mean(h.kl_cat))

    def loss_ref(kl, qm, qlv, pi, pm, plv):
        return scalar_loss(elbo_lib.head_from_noise(
            g, eps, kl, qm, qlv, elbo_lib.MixturePrior(pi, pm, plv), tau))

    def loss_fused(kl, qm, qlv, pi, pm, plv):
        return scalar_loss(fused_elbo.fused_mixture_elbo(
            key, kl, qm, qlv, elbo_lib.MixturePrior(pi, pm, plv), tau,
            noise_mode='threefry', interpret=True))

    args = (kl, qm, qlv, *prior)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    for a, b_ in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_end_to_end_gradients_with_kernel_backward():
    """Full fused head (kernel fwd + kernel bwd) == jnp golden gradients."""
    assert fused_elbo.BWD_IMPL == 'pallas'
    b, k, d = 16, 4, 6
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    kl = jax.random.normal(ks[0], (b, k))
    qm = jax.random.normal(ks[1], (b, k, d))
    qlv = jax.random.uniform(ks[2], (b, k, d), minval=-1, maxval=1)
    prior = elbo_lib.MixturePrior(
        jax.random.normal(ks[3], (k,)),
        jax.random.normal(ks[4], (k, d)),
        jax.random.uniform(ks[5], (k, d), minval=-1, maxval=1))
    key, tau = ks[6], jnp.float32(0.9)

    def scalar_loss(h):
        return (0.1 * jnp.sum(h.z) + 0.03 * jnp.sum(h.y)
                + jnp.mean(h.log_prior_mix - h.log_q_mix)
                + jnp.mean(h.log_p_cond - h.log_q_cond)
                - jnp.mean(h.kl_cat))

    def loss_ref(kl, qm, qlv, pi, pm, plv):
        return scalar_loss(elbo_lib.mixture_elbo_head(
            key, kl, qm, qlv, elbo_lib.MixturePrior(pi, pm, plv), tau))

    def loss_fused(kl, qm, qlv, pi, pm, plv):
        return scalar_loss(fused_elbo.fused_mixture_elbo(
            key, kl, qm, qlv, elbo_lib.MixturePrior(pi, pm, plv), tau,
            noise_mode='xla', interpret=True))

    args = (kl, qm, qlv, *prior)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    for a, b_ in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)
