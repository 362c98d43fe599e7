"""Math-core unit tests: closed forms vs scipy (SURVEY.md §4.2 tier 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from gmvae_tpu.ops import dists

KEY = jax.random.PRNGKey(0)


def test_gauss_logpdf_matches_scipy():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(7, 5)).astype(np.float32)
    mean = rng.normal(size=(7, 5)).astype(np.float32)
    logvar = rng.uniform(-2, 2, size=(7, 5)).astype(np.float32)
    got = dists.gauss_logpdf(jnp.array(z), jnp.array(mean), jnp.array(logvar))
    want = scipy.stats.norm.logpdf(z, mean, np.exp(0.5 * logvar)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gauss_sample_moments():
    mean = jnp.full((200_000, 2), 3.0)
    logvar = jnp.full((200_000, 2), np.log(4.0))
    z = dists.gauss_sample(KEY, mean, logvar)
    np.testing.assert_allclose(z.mean(), 3.0, atol=0.02)
    np.testing.assert_allclose(z.std(), 2.0, atol=0.02)


def test_gauss_kl_standard_normal_closed_form():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(4, 6)).astype(np.float32)
    lv = rng.uniform(-1, 1, size=(4, 6)).astype(np.float32)
    got = dists.gauss_kl(jnp.array(m), jnp.array(lv))
    want = 0.5 * np.sum(np.exp(lv) + m**2 - 1 - lv, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gauss_kl_general_vs_monte_carlo():
    key = jax.random.PRNGKey(42)
    m_q = jnp.array([0.5, -1.0]); lv_q = jnp.array([0.2, -0.3])
    m_p = jnp.array([-0.2, 0.7]); lv_p = jnp.array([-0.5, 0.4])
    analytic = dists.gauss_kl(m_q, lv_q, m_p, lv_p)
    z = dists.gauss_sample(key, jnp.broadcast_to(m_q, (500_000, 2)), lv_q)
    mc = jnp.mean(dists.gauss_logpdf(z, m_q, lv_q) -
                  dists.gauss_logpdf(z, m_p, lv_p))
    np.testing.assert_allclose(analytic, mc, rtol=0.02)


def test_gauss_kl_zero_when_identical():
    m = jnp.array([1.0, 2.0]); lv = jnp.array([0.3, -0.4])
    np.testing.assert_allclose(dists.gauss_kl(m, lv, m, lv), 0.0, atol=1e-6)


def test_mixture_logpdf_vs_bruteforce():
    rng = np.random.default_rng(2)
    K, D, B = 5, 3, 11
    z = rng.normal(size=(B, D)).astype(np.float32)
    means = rng.normal(size=(K, D)).astype(np.float32)
    logvars = rng.uniform(-1, 1, size=(K, D)).astype(np.float32)
    w = rng.dirichlet(np.ones(K)).astype(np.float32)

    got = dists.mixture_logpdf(jnp.array(z), jnp.log(jnp.array(w)),
                               jnp.array(means), jnp.array(logvars))
    # brute force: log(sum_k w_k prod_d N(z_d; m_kd, v_kd))
    dens = np.zeros(B)
    for k in range(K):
        dens += w[k] * np.prod(
            scipy.stats.norm.pdf(z, means[k], np.exp(0.5 * logvars[k])), axis=-1)
    np.testing.assert_allclose(got, np.log(dens), rtol=1e-4, atol=1e-5)


def test_mixture_logpdf_single_component_reduces_to_gauss():
    rng = np.random.default_rng(3)
    z = jnp.array(rng.normal(size=(4, 6)), jnp.float32)
    mean = jnp.array(rng.normal(size=(1, 6)), jnp.float32)
    logvar = jnp.zeros((1, 6))
    got = dists.mixture_logpdf(z, jnp.zeros((1,)), mean, logvar)
    want = dists.gauss_logpdf(z, mean[0], logvar[0])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gumbel_softmax_is_simplex():
    logits = jax.random.normal(KEY, (64, 10))
    y = dists.gumbel_softmax(jax.random.PRNGKey(1), logits, 0.7)
    np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-5)
    assert (y >= 0).all()


def test_gumbel_softmax_low_tau_approaches_onehot():
    logits = jax.random.normal(KEY, (128, 8))
    y = dists.gumbel_softmax(jax.random.PRNGKey(2), logits, 1e-2)
    # near-ties between top-2 gumbel-perturbed logits keep a few samples off
    # the vertex even at tau=0.01 — check the bulk, not the worst case
    maxes = y.max(-1)
    assert float(jnp.median(maxes)) > 0.999
    assert float(maxes.mean()) > 0.98


def test_gumbel_softmax_mean_matches_softmax_probs():
    # E[argmax one-hot] under Gumbel-max == softmax(logits); at low tau the
    # relaxed mean approaches it.
    logits = jnp.array([1.0, 0.0, -1.0])
    keys = jax.random.split(jax.random.PRNGKey(3), 40_000)
    y = jax.vmap(lambda k: dists.gumbel_softmax(k, logits, 0.05))(keys)
    np.testing.assert_allclose(y.mean(0), jax.nn.softmax(logits), atol=0.01)


def test_gumbel_softmax_hard_is_onehot_with_soft_grad():
    logits = jnp.array([[0.3, 0.1, -0.2]])

    def f(lg):
        y = dists.gumbel_softmax(jax.random.PRNGKey(4), lg, 0.8, hard=True)
        return jnp.sum(y * jnp.array([1.0, 2.0, 3.0]))

    y = dists.gumbel_softmax(jax.random.PRNGKey(4), logits, 0.8, hard=True)
    yv = np.asarray(y)
    np.testing.assert_allclose(yv, np.round(yv), atol=1e-6)  # one-hot values
    np.testing.assert_allclose(yv.sum(-1), 1.0, atol=1e-6)
    g = jax.grad(f)(logits)
    assert np.abs(np.asarray(g)).sum() > 0  # straight-through gradient flows


def test_categorical_kl_closed_form():
    logits_q = jnp.array([[2.0, 0.0, -1.0]])
    log_prior = jax.nn.log_softmax(jnp.array([0.5, 0.5, 0.0]))
    q = np.asarray(jax.nn.softmax(logits_q))
    p = np.asarray(jnp.exp(log_prior))
    want = np.sum(q * (np.log(q) - np.log(p)), axis=-1)
    np.testing.assert_allclose(dists.categorical_kl(logits_q, log_prior), want,
                               rtol=1e-4)
    # KL(q||q) == 0
    np.testing.assert_allclose(
        dists.categorical_kl(logits_q, jax.nn.log_softmax(logits_q, -1)), 0.0,
        atol=1e-6)


def test_temperature_schedule():
    assert float(dists.temperature_schedule(0, tau0=1.0)) == 1.0
    assert float(dists.temperature_schedule(10**9, tau_min=0.5)) == 0.5
    t1 = float(dists.temperature_schedule(1000))
    t2 = float(dists.temperature_schedule(2000))
    assert 0.5 <= t2 < t1 < 1.0


def test_bernoulli_ll_matches_manual():
    rng = np.random.default_rng(4)
    x = (rng.uniform(size=(5, 4, 4, 1)) > 0.5).astype(np.float32)
    logits = rng.normal(size=(5, 4, 4, 1)).astype(np.float32)
    p = 1 / (1 + np.exp(-logits))
    want = (x * np.log(p) + (1 - x) * np.log1p(-p)).reshape(5, -1).sum(-1)
    got = dists.bernoulli_ll(jnp.array(x), jnp.array(logits))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gaussian_ll_matches_scipy():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 2, 2, 3)).astype(np.float32)
    mean = rng.normal(size=(3, 2, 2, 3)).astype(np.float32)
    logvar = np.float32(-0.5)
    want = scipy.stats.norm.logpdf(x, mean,
                                   np.exp(0.5 * logvar)).reshape(3, -1).sum(-1)
    got = dists.gaussian_ll(jnp.array(x), jnp.array(mean), jnp.array(logvar))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_logvar_clamp_keeps_densities_finite():
    z = jnp.zeros((2, 3))
    big = jnp.full((2, 3), 1e9)
    small = jnp.full((2, 3), -1e9)
    assert np.isfinite(dists.gauss_logpdf(z, z, big)).all()
    assert np.isfinite(dists.gauss_logpdf(z, z, small)).all()
    assert np.isfinite(dists.gauss_sample(KEY, z, big)).all()
