"""Deep-mixture (hierarchical w-latent) variant: models/deep.py.

SURVEY.md §1.1's third model family. Math checks lean on internal
consistency identities (the ELBO decomposition, the responsibility/marginal
LSE identity, the K=1 degeneracy) plus the same planted-cluster integration
bar the GMVAE passes (SURVEY.md §4.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmvae_tpu import configs
from gmvae_tpu import training as train_lib
from gmvae_tpu.models.deep import DeepGMVAE
from gmvae_tpu.ops import dists


def _deep_cfg(**kw):
    base = dict(model_family='deep', w_dim=4, prior_hidden=32,
                run_dir='/tmp/gmvae_test_runs')
    base.update(kw)
    return configs.synthetic_tiny().replace(**base)


@pytest.fixture(scope='module')
def small_model():
    cfg = _deep_cfg()
    model = DeepGMVAE(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((16, 8, 8, 1)),
                    jnp.float32)
    params = model.init({'params': jax.random.PRNGKey(0)}, x,
                        jax.random.PRNGKey(1), jnp.float32(1.0))['params']
    return cfg, model, params, x


def test_elbo_decomposition(small_model):
    """elbo == log p(x|z) - (w+z prior terms) - k prior term, exactly."""
    cfg, model, params, x = small_model
    elbo, aux = model.apply({'params': params}, x, jax.random.PRNGKey(2),
                            jnp.float32(1.0))
    np.testing.assert_allclose(
        np.asarray(elbo),
        np.asarray(aux['log_px_z'] - aux['kl_z'] - aux['kl_cat']),
        rtol=1e-6)
    # every divergence term is a (weighted sum of) KLs: nonnegative
    assert np.all(np.asarray(aux['kl_z']) >= -1e-5)
    assert np.all(np.asarray(aux['kl_cat']) >= -1e-5)
    assert np.isfinite(np.asarray(elbo)).all()


def test_responsibility_marginal_identity(small_model):
    """LSE over the unnormalized responsibility logits IS the mixture
    marginal log p(z|w) — Bayes consistency of q(k|w,z)."""
    cfg, model, params, x = small_model

    def probe(mdl, x):
        w_mean, _, z_mean, _ = mdl.encode(x)
        p_means, p_logvars = mdl.prior_params(w_mean)
        logits = mdl.responsibility_logits(z_mean, p_means, p_logvars)
        log_pi = jax.nn.log_softmax(mdl.pi_logits)
        marginal = dists.mixture_logpdf(z_mean, log_pi, p_means, p_logvars)
        return logits, marginal

    logits, marginal = model.apply({'params': params}, x, method=probe)
    np.testing.assert_allclose(
        np.asarray(jax.scipy.special.logsumexp(logits, axis=-1)),
        np.asarray(marginal), rtol=1e-6)
    # responsibilities normalize
    r = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(r.sum(-1), 1.0, rtol=1e-6)


def test_k1_has_zero_categorical_kl():
    cfg = _deep_cfg(n_components=1)
    model = DeepGMVAE(cfg)
    x = jnp.asarray(np.random.default_rng(1).random((8, 8, 8, 1)),
                    jnp.float32)
    params = model.init({'params': jax.random.PRNGKey(0)}, x,
                        jax.random.PRNGKey(1), jnp.float32(1.0))['params']
    _, aux = model.apply({'params': params}, x, jax.random.PRNGKey(2),
                         jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(aux['kl_cat']), 0.0, atol=1e-6)
    r = np.asarray(jax.nn.softmax(aux['k_logits'], axis=-1))
    np.testing.assert_allclose(r, 1.0, rtol=1e-6)


def test_gradients_reach_every_parameter(small_model):
    cfg, model, params, x = small_model

    def loss(p):
        elbo, _ = model.apply({'params': p}, x, jax.random.PRNGKey(3),
                              jnp.float32(1.0))
        return -jnp.mean(elbo)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        g = np.asarray(g)
        assert np.isfinite(g).all(), name
        assert np.abs(g).max() > 0, f'dead gradient: {name}'


def test_verbs_roundtrip(small_model):
    cfg, model, params, x = small_model
    k, d = cfg.n_components, cfg.latent_dim

    logits = model.apply({'params': params}, x, method=model.cluster_logits)
    assert logits.shape == (x.shape[0], k)
    z, q = model.apply({'params': params}, x, method=model.latent)
    assert z.shape == (x.shape[0], d) and q.shape == (x.shape[0], k)
    rec = model.apply({'params': params}, x, method=model.reconstruct)
    assert rec.shape == x.shape
    s = model.apply({'params': params}, jax.random.PRNGKey(5), 6,
                    method=model.sample)
    assert s.shape == (6, *cfg.image_shape)
    s0 = model.apply({'params': params}, jax.random.PRNGKey(5), 6, 0,
                     method=model.sample)
    assert np.isfinite(np.asarray(s0)).all()


def test_deep_variant_recovers_planted_clusters():
    """Same integration bar as the GMVAE (SURVEY.md §4.2 tier 4)."""
    cfg = _deep_cfg(steps=400, eval_every=50)
    trainer, state, history = train_lib.fit(cfg)
    elbos = [h['elbo_nats'] for h in history]
    assert elbos[-1] > elbos[0] + 0.5, elbos
    assert history[-1]['acc'] > 0.9, history[-1]
    assert np.isfinite(elbos[-1])


def test_named_config_constructs():
    cfg = configs.get_config('mnist_deepmix')
    assert cfg.model_family == 'deep'
    model = train_lib.make_model(cfg)
    assert isinstance(model, DeepGMVAE)
