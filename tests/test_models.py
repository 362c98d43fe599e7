"""Per-architecture model smoke tests: every BASELINE config's network
family runs forward + backward with finite outputs (SURVEY.md §2.1 rows
MLP/conv/ResNet enc-dec, GMVAE model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmvae_tpu import configs
from gmvae_tpu.models import nets
from gmvae_tpu.models.gmvae import GMVAE, init_params, param_count


def _shrunk(cfg):
    """Scale a named config down to CPU-test size, keeping its architecture
    family, likelihood, and K intact."""
    over = dict(batch_size=4)
    if cfg.arch == 'mlp':
        over['enc_hidden'] = (32, 32)
        over['dec_hidden'] = (32, 32)
    else:
        over['enc_hidden'] = tuple(8 for _ in cfg.enc_hidden)
        over['dec_hidden'] = tuple(8 for _ in cfg.dec_hidden)
    over['latent_dim'] = min(cfg.latent_dim, 8)
    return cfg.replace(**over)


@pytest.mark.parametrize('name', ['mnist_k10', 'fmnist_deep', 'svhn_conv',
                                  'cifar_k20', 'celeba_dp16'])
def test_arch_forward_backward(name):
    cfg = _shrunk(configs.get_config(name, compute_dtype='float32'))
    model = GMVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    assert param_count(params) > 0
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, *cfg.image_shape))
    key, tau = jax.random.PRNGKey(2), jnp.float32(1.0)

    def loss(p):
        elbo, _ = model.apply({'params': p}, x, key, tau)
        return -jnp.mean(elbo)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize('name', ['svhn_conv', 'cifar_k20'])
def test_gaussian_likelihood_heads(name):
    """Gaussian-likelihood decoders emit (mean, logvar) of image shape."""
    cfg = _shrunk(configs.get_config(name))
    model = GMVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.latent_dim))
    mean, logvar = model.apply({'params': params}, z, method=model.decode)
    assert mean.shape == (3, *cfg.image_shape)
    assert logvar.shape == (3, *cfg.image_shape)
    # sample/reconstruct produce images, not logits, for gaussian models
    imgs = model.apply({'params': params}, jax.random.PRNGKey(2), 2,
                       method=model.sample)
    assert imgs.shape == (2, *cfg.image_shape)


def test_k1_degenerates_to_plain_vae():
    """K=1 is the plain-VAE special case of the mixture (the reference
    repo's separate VAE variant, SURVEY.md §2.4): a one-category Gumbel is
    deterministic, the mixture prior reduces to a single Gaussian, and the
    model must still train — forward + backward finite, and a short train
    loop improves the ELBO."""
    from gmvae_tpu import training as train_lib
    cfg = configs.synthetic_tiny(n_components=1, steps=40, eval_every=10**9,
                                 ckpt_every=0, scan_steps=20)
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    idx = trainer.batch_plan(cfg.steps)
    state, m = trainer.run_chunk(state, idx[:20])
    first = float(np.asarray(m['elbo'][0]))
    state, m = trainer.run_chunk(state, idx[20:])
    last = float(np.asarray(m['elbo'][-1]))
    assert np.isfinite(first) and np.isfinite(last)
    assert last > first


def test_bfloat16_compute_path():
    """compute_dtype='bfloat16' runs the MXU path; outputs stay float32."""
    cfg = _shrunk(configs.mnist_k10(compute_dtype='bfloat16'))
    model = GMVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, *cfg.image_shape))
    elbo, aux = model.apply({'params': params}, x, jax.random.PRNGKey(2),
                            jnp.float32(1.0))
    assert elbo.dtype == jnp.float32
    assert np.isfinite(np.asarray(elbo)).all()
    # params remain f32 master copies
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))


def test_encoder_head_shapes():
    cfg = configs.synthetic_tiny()
    model = GMVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, *cfg.image_shape))
    k_logits, q_means, q_logvars = model.apply({'params': params}, x,
                                               method=model.encode)
    K, D = cfg.n_components, cfg.latent_dim
    assert k_logits.shape == (5, K)
    assert q_means.shape == (5, K, D)
    assert q_logvars.shape == (5, K, D)


def test_checked_elbo_reports_clean_on_healthy_model():
    from gmvae_tpu.utils.debug import checked_elbo, tau_floor_audit
    cfg = configs.synthetic_tiny()
    model = GMVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, *cfg.image_shape))
    msg, flags = checked_elbo(model, params, x, jax.random.PRNGKey(2),
                              jnp.float32(0.7))
    assert msg is None
    assert all(flags.values())
    audit = tau_floor_audit(cfg)
    assert audit['floor_respected']


def test_checked_elbo_catches_poisoned_params():
    import jax.numpy as jnp
    from gmvae_tpu.utils.debug import checked_elbo
    cfg = configs.synthetic_tiny()
    model = GMVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    # poison the decoder output kernel with NaN
    poisoned = jax.tree.map(lambda a: a, params)
    leaf_path = 'decoder'
    assert leaf_path in poisoned
    k = list(poisoned['decoder'].keys())[0]
    poisoned['decoder'][k]['kernel'] = (
        poisoned['decoder'][k]['kernel'].at[0, 0].set(jnp.nan))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, *cfg.image_shape))
    msg, flags = checked_elbo(model, poisoned, x, jax.random.PRNGKey(2),
                              jnp.float32(0.7))
    assert msg is not None            # provenance reported, not a bare NaN
    assert not all(flags.values())


def test_conv_decoder_rejects_indivisible_resolution():
    cfg = configs.synthetic_tiny(arch='conv', image_shape=(28, 28, 1),
                                 dec_hidden=(16, 16, 16))
    with pytest.raises(ValueError, match='divide'):
        nets.make_decoder(cfg)


def test_sample_component_out_of_range_rejected():
    cfg = configs.synthetic_tiny()
    model = GMVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match='component'):
        model.apply({'params': params}, jax.random.PRNGKey(1), 4,
                    cfg.n_components, method=model.sample)
