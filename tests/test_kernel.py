"""Fused Pallas kernel vs jnp golden path (SURVEY.md §4.2 tier 2).

Runs the kernel in interpret mode on CPU with 'xla' noise (threefry drawn
outside and streamed in), which must match ``ops.elbo.mixture_elbo_head``
bit-for-intent — forward AND gradients. The in-kernel-PRNG modes and the
compiled Mosaic path are exercised on real TPU (benchmarks/ and the
driver's entry check); parity there was verified at <1e-5 max abs diff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmvae_tpu.ops import elbo as elbo_lib
from gmvae_tpu.ops.kernels import fused_elbo


def _problem(b=37, k=5, d=11, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    k_logits = jax.random.normal(ks[0], (b, k))
    q_means = jax.random.normal(ks[1], (b, k, d))
    q_logvars = jax.random.uniform(ks[2], (b, k, d), minval=-1, maxval=1)
    prior = elbo_lib.MixturePrior(
        jax.random.normal(ks[3], (k,)),
        jax.random.normal(ks[4], (k, d)),
        jax.random.uniform(ks[5], (k, d), minval=-1, maxval=1))
    return ks[6], k_logits, q_means, q_logvars, prior


@pytest.mark.parametrize('hard', [False, True])
def test_forward_matches_golden(hard):
    key, k_logits, q_means, q_logvars, prior = _problem()
    tau = jnp.float32(0.8)
    ref = elbo_lib.mixture_elbo_head(key, k_logits, q_means, q_logvars,
                                     prior, tau, hard=hard)
    got = fused_elbo.fused_mixture_elbo(key, k_logits, q_means, q_logvars,
                                        prior, tau, hard=hard,
                                        noise_mode='xla', interpret=True)
    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize('hard', [False, True])
def test_gradients_match_golden(hard):
    key, k_logits, q_means, q_logvars, prior = _problem(b=16, k=4, d=6,
                                                        seed=1)
    tau = jnp.float32(0.8)

    def scalar_loss(head: elbo_lib.HeadOutputs):
        # touches every output so every cotangent path is exercised
        return (0.1 * jnp.sum(head.z) + 0.03 * jnp.sum(head.y)
                + jnp.mean(head.log_prior_mix - head.log_q_mix)
                + jnp.mean(head.log_p_cond - head.log_q_cond)
                - jnp.mean(head.kl_cat))

    def loss_ref(kl, qm, qlv, pi, pm, plv):
        h = elbo_lib.mixture_elbo_head(
            key, kl, qm, qlv, elbo_lib.MixturePrior(pi, pm, plv), tau,
            hard=hard)
        return scalar_loss(h)

    def loss_fused(kl, qm, qlv, pi, pm, plv):
        h = fused_elbo.fused_mixture_elbo(
            key, kl, qm, qlv, elbo_lib.MixturePrior(pi, pm, plv), tau,
            hard=hard, noise_mode='xla', interpret=True)
        return scalar_loss(h)

    args = (k_logits, q_means, q_logvars, *prior)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_unaligned_batch_padding():
    # batch not a multiple of 8: wrapper pads / unpads transparently
    key, k_logits, q_means, q_logvars, prior = _problem(b=13, k=3, d=5,
                                                        seed=2)
    tau = jnp.float32(1.1)
    ref = elbo_lib.mixture_elbo_head(key, k_logits, q_means, q_logvars,
                                     prior, tau)
    got = fused_elbo.fused_mixture_elbo(key, k_logits, q_means, q_logvars,
                                        prior, tau, noise_mode='xla',
                                        interpret=True)
    assert got.z.shape == (13, 5)
    np.testing.assert_allclose(np.asarray(ref.z), np.asarray(got.z),
                               rtol=1e-5, atol=1e-5)


def test_model_level_equivalence():
    """Full GMVAE loss with fused head (interpret) == with jnp head."""
    from gmvae_tpu import configs
    from gmvae_tpu.models.gmvae import GMVAE, init_params

    cfg = configs.synthetic_tiny()
    head = lambda *a, **kw: fused_elbo.fused_mixture_elbo(
        *a, **kw, noise_mode='xla', interpret=True)
    m_ref = GMVAE(cfg)
    m_fused = GMVAE(cfg, head_fn=head)
    params = init_params(m_ref, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, *cfg.image_shape))
    key, tau = jax.random.PRNGKey(2), jnp.float32(0.9)

    e_ref, _ = m_ref.apply({'params': params}, x, key, tau)
    e_fused, _ = m_fused.apply({'params': params}, x, key, tau)
    np.testing.assert_allclose(np.asarray(e_ref), np.asarray(e_fused),
                               rtol=1e-5, atol=1e-4)

    g_ref = jax.grad(
        lambda p: -jnp.mean(m_ref.apply({'params': p}, x, key, tau)[0]))(
            params)
    g_fused = jax.grad(
        lambda p: -jnp.mean(m_fused.apply({'params': p}, x, key, tau)[0]))(
            params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_forward_matches_golden_3d_layout():
    """d >= 128 selects the 3-D-layout kernel (lanes already full there);
    keep it covered now that small-d problems auto-select the flat layout."""
    assert not fused_elbo.use_flat_layout(3, 128)
    key, k_logits, q_means, q_logvars, prior = _problem(b=9, k=3, d=128,
                                                        seed=8)
    tau = jnp.float32(0.8)
    ref = elbo_lib.mixture_elbo_head(key, k_logits, q_means, q_logvars,
                                     prior, tau)
    got = fused_elbo.fused_mixture_elbo(key, k_logits, q_means, q_logvars,
                                        prior, tau, noise_mode='xla',
                                        interpret=True)
    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_is_supported_reports_backend():
    assert fused_elbo.is_supported() == (jax.default_backend() == 'tpu')


def test_threefry_module_matches_jax_internals():
    """Our shared threefry-2x32 == jax.random's generator, bit-for-bit."""
    from jax._src import prng as jprng
    from gmvae_tpu.ops.kernels import threefry as tf
    k = jnp.array([123, 456], dtype=jnp.uint32)
    cnt = jnp.arange(64, dtype=jnp.uint32)
    ref = jprng.threefry_2x32(k, cnt)
    x0, x1 = tf.threefry2x32(k[0], k[1], cnt[:32], cnt[32:])
    np.testing.assert_array_equal(np.asarray(ref),
                                  np.asarray(jnp.concatenate([x0, x1])))


def test_threefry_mode_bitexact_with_host_replay():
    """In-kernel threefry noise (interpret) == host-side replay with the
    same key/counters — the 'on-chip threefry PRNG' north-star contract."""
    from gmvae_tpu.ops.kernels import threefry as tf
    key, k_logits, q_means, q_logvars, prior = _problem(b=21, k=4, d=6,
                                                        seed=5)
    tau = jnp.float32(0.9)
    got = fused_elbo.fused_mixture_elbo(key, k_logits, q_means, q_logvars,
                                        prior, tau, noise_mode='threefry',
                                        interpret=True)
    k0 = key[0].astype(jnp.uint32)
    k1 = key[1].astype(jnp.uint32)
    g = tf.gumbel_from_grid(k0, k1, *tf.host_grid(21, 4))
    eps = tf.normal_from_grid(k0, k1, *tf.host_grid(21, 6))
    ref = elbo_lib.head_from_noise(g, eps, k_logits, q_means, q_logvars,
                                   prior, tau)
    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_threefry_noise_statistics():
    from gmvae_tpu.ops.kernels import threefry as tf
    k0, k1 = jnp.uint32(7), jnp.uint32(13)
    eps = tf.normal_from_grid(k0, k1, *tf.host_grid(4096, 16))
    assert abs(float(eps.mean())) < 0.02
    np.testing.assert_allclose(float(eps.std()), 1.0, atol=0.02)
    g = tf.gumbel_from_grid(k0, k1, *tf.host_grid(4096, 16))
    np.testing.assert_allclose(float(g.mean()), 0.5772, atol=0.02)  # Euler
    np.testing.assert_allclose(float(g.std()), np.pi / np.sqrt(6), atol=0.02)


def test_threefry_streams_are_independent_across_keys_and_salts():
    from gmvae_tpu.ops.kernels import threefry as tf
    grid = tf.host_grid(64, 8)
    a = tf.gumbel_from_grid(jnp.uint32(1), jnp.uint32(2), *grid)
    b = tf.gumbel_from_grid(jnp.uint32(1), jnp.uint32(3), *grid)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # gumbel vs normal salts give different bits at identical counters
    n = tf.normal_from_grid(jnp.uint32(1), jnp.uint32(2), *grid)
    assert not np.allclose(np.asarray(a), np.asarray(n))


def test_threefry_mode_gradients_flow():
    key, k_logits, q_means, q_logvars, prior = _problem(b=16, k=4, d=6,
                                                        seed=6)
    tau = jnp.float32(0.8)

    def loss(qm):
        h = fused_elbo.fused_mixture_elbo(key, k_logits, qm, q_logvars,
                                          prior, tau, noise_mode='threefry',
                                          interpret=True)
        return jnp.mean(h.log_prior_mix - h.log_q_mix) + 0.1 * jnp.sum(h.z)

    g = jax.grad(loss)(q_means)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_trainer_trajectory_fused_vs_jnp_head():
    """10 training steps with the fused head (interpret, xla noise) track the
    jnp-head trajectory exactly — the kernel-swap regression at the level
    that matters (gradients through the full model + optimizer)."""
    from functools import partial
    from gmvae_tpu import configs
    from gmvae_tpu import training as train_lib
    from gmvae_tpu import data as data_lib
    from gmvae_tpu.models.gmvae import GMVAE, init_params

    cfg = configs.synthetic_tiny(batch_size=32)
    ds = data_lib.make_synthetic(image_shape=cfg.image_shape, n_train=128,
                                 seed=2)
    head = partial(fused_elbo.fused_mixture_elbo, noise_mode='xla',
                   interpret=True)

    import optax
    from gmvae_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(dp_devices=1, devices=jax.devices()[:1])
    tx = train_lib.make_optimizer(cfg)
    import numpy as _np
    idx = jnp.asarray(_np.random.default_rng(0).integers(
        0, 128, size=(10, cfg.batch_size)).astype(_np.int32))
    x_all = jnp.asarray(ds.train_x)

    results = {}
    for name, model in (('jnp', GMVAE(cfg)), ('fused', GMVAE(cfg, head_fn=head))):
        params = init_params(GMVAE(cfg), jax.random.PRNGKey(0))
        state = train_lib.TrainState(params, tx.init(params), jnp.int32(0))
        state = jax.device_put(state, mesh_lib.replicated(mesh))
        # interpret-mode pallas needs the vma checker off (its block
        # indexing lowers through dynamic_slice ops check_vma rejects);
        # the real Mosaic path runs with the checker ON
        chunk = train_lib.make_train_chunk(model, cfg, mesh, tx,
                                           check_vma=(name == 'jnp'))
        state, metrics = chunk(
            state, jax.device_put(x_all, mesh_lib.replicated(mesh)),
            jax.device_put(idx, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, mesh_lib.DATA_AXIS))),
            jax.random.PRNGKey(1))
        results[name] = np.asarray(metrics['elbo'])
    np.testing.assert_allclose(results['fused'], results['jnp'],
                               rtol=5e-5, atol=5e-4)
