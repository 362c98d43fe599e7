"""Distributed (DP) tests on 8 fake CPU devices (SURVEY.md §4.2 tier 6).

(a) the shard_map+psum step equals a hand-computed reference that averages
    per-shard gradients; (b) params stay replicated across devices; (c) the
    1-device mesh path is the same code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gmvae_tpu import configs
from gmvae_tpu import data as data_lib
from gmvae_tpu import training as train_lib
from gmvae_tpu.models.gmvae import init_params
from gmvae_tpu.parallel import mesh as mesh_lib


N_DEV = 8


@pytest.fixture(scope='module')
def setup():
    assert jax.device_count() >= N_DEV, 'conftest must provide 8 fake devices'
    cfg = configs.synthetic_tiny(batch_size=64)
    model = train_lib.make_model(cfg)
    tx = train_lib.make_optimizer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    ds = data_lib.make_synthetic(image_shape=cfg.image_shape,
                                 n_clusters=2, n_train=256, seed=1)
    # the train chunk DONATES its state; hand every test a fresh deep copy
    # so the shared fixture params are never invalidated
    fresh = lambda: jax.tree.map(jnp.array, params)
    return cfg, model, tx, fresh, ds


def _manual_step(cfg, model, tx, params, opt_state, x_all, idx_row, base_key,
                 step, n_shards):
    """Pure-jnp reference for one DP step: per-shard grads with the same
    fold_in(step)+fold_in(shard) keys, arithmetic mean, one optax update."""
    loss_fn = train_lib.make_loss_fn(model, cfg)
    b_local = idx_row.shape[0] // n_shards
    grads_sum = None
    for s in range(n_shards):
        key = jax.random.fold_in(jax.random.fold_in(base_key, step), s)
        k_pre, k_elbo = jax.random.split(key)
        batch = x_all[idx_row[s * b_local:(s + 1) * b_local]]
        x = data_lib.preprocess_batch(k_pre, batch, cfg.binarize)
        g = jax.grad(lambda p: loss_fn(p, x, k_elbo, jnp.int32(step))[0])(
            params)
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    grads = jax.tree.map(lambda a: a / n_shards, grads_sum)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def test_dp_step_matches_manual_shard_average(setup):
    cfg, model, tx, fresh, ds = setup
    params = fresh()
    mesh = mesh_lib.make_mesh(dp_devices=N_DEV,
                              devices=jax.devices()[:N_DEV])
    state = train_lib.TrainState(params, tx.init(params), jnp.int32(0))
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    x_all = jax.device_put(jnp.asarray(ds.train_x),
                           mesh_lib.replicated(mesh))
    base_key = jax.random.PRNGKey(9)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, ds.train_x.shape[0],
                       size=(1, cfg.batch_size)).astype(np.int32)
    idx_dev = jax.device_put(jnp.asarray(idx),
                             NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS)))

    chunk = train_lib.make_train_chunk(model, cfg, mesh, tx)
    new_state, _ = chunk(state, x_all, idx_dev, base_key)

    params2 = fresh()
    want_params, _ = _manual_step(cfg, model, tx, params2, tx.init(params2),
                                  jnp.asarray(ds.train_x), jnp.asarray(idx[0]),
                                  base_key, 0, N_DEV)
    for got, want in zip(jax.tree.leaves(new_state.params),
                         jax.tree.leaves(want_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-5, atol=5e-6)


def test_params_replicated_after_steps(setup):
    cfg, model, tx, fresh, ds = setup
    params = fresh()
    mesh = mesh_lib.make_mesh(dp_devices=N_DEV,
                              devices=jax.devices()[:N_DEV])
    state = train_lib.TrainState(params, tx.init(params), jnp.int32(0))
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    x_all = jax.device_put(jnp.asarray(ds.train_x), mesh_lib.replicated(mesh))
    rng = np.random.default_rng(1)
    idx = jax.device_put(
        jnp.asarray(rng.integers(0, ds.train_x.shape[0],
                                 size=(5, cfg.batch_size)).astype(np.int32)),
        NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS)))
    chunk = train_lib.make_train_chunk(model, cfg, mesh, tx)
    state, metrics = chunk(state, x_all, idx, jax.random.PRNGKey(3))

    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated
    # physically identical on every device
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    assert np.isfinite(np.asarray(metrics['elbo'])).all()


def test_single_device_mesh_same_code_path(setup):
    cfg, model, tx, fresh, ds = setup
    params = fresh()
    mesh1 = mesh_lib.make_mesh(dp_devices=1, devices=jax.devices()[:1])
    state = train_lib.TrainState(params, tx.init(params), jnp.int32(0))
    state = jax.device_put(state, mesh_lib.replicated(mesh1))
    x_all = jax.device_put(jnp.asarray(ds.train_x), mesh_lib.replicated(mesh1))
    idx = jax.device_put(
        jnp.arange(2 * cfg.batch_size, dtype=jnp.int32).reshape(2, -1) % 256,
        NamedSharding(mesh1, P(None, mesh_lib.DATA_AXIS)))
    chunk = train_lib.make_train_chunk(model, cfg, mesh1, tx)
    state, metrics = chunk(state, x_all, idx, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(metrics['elbo'])).all()


def test_sharded_dataset_trains_and_stays_replicated(setup):
    """data_sharding='sharded': dataset partitioned over the data axis
    (1/n_dp HBM per device), per-shard local batch plans, params still
    replicated after psum steps."""
    cfg, _, _, _, ds = setup
    cfg = cfg.replace(data_sharding='sharded', dp_devices=N_DEV)
    trainer = train_lib.Trainer(cfg, ds)
    # dataset physically sharded: each device holds n/n_dp rows
    assert trainer.x_all.sharding.spec == P(mesh_lib.DATA_AXIS)
    shard_rows = trainer.x_all.addressable_shards[0].data.shape[0]
    assert shard_rows == trainer.x_all.shape[0] // N_DEV == trainer.n_local

    idx = trainer.batch_plan(4)
    # every index is LOCAL to its shard's partition
    assert int(jnp.max(idx)) < trainer.n_local
    # shards draw from independent permutation streams
    cols = np.asarray(idx).reshape(4, N_DEV, -1)
    assert not np.array_equal(cols[:, 0], cols[:, 1])

    state = trainer.init_state()
    state, metrics = trainer.run_chunk(state, idx)
    assert np.isfinite(np.asarray(metrics['elbo'])).all()
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_sharded_dataset_sees_whole_dataset():
    """Union of all shards' gathered rows covers the full (padded) dataset
    within one epoch — partitioning must not orphan examples."""
    cfg = configs.synthetic_tiny(batch_size=64, data_sharding='sharded',
                                 dp_devices=N_DEV)
    ds = data_lib.make_synthetic(image_shape=cfg.image_shape, n_train=256,
                                 seed=5)
    trainer = train_lib.Trainer(cfg, ds)
    n_local = trainer.n_local                      # 256/8 = 32
    steps_per_epoch = n_local // (cfg.batch_size // N_DEV)  # 32/8 = 4
    idx = np.asarray(trainer.batch_plan(steps_per_epoch))
    cols = idx.reshape(steps_per_epoch, N_DEV, -1)
    for s in range(N_DEV):
        got = np.sort(cols[:, s].ravel())
        np.testing.assert_array_equal(got, np.arange(n_local))


def test_batch_size_divisibility_enforced():
    cfg = configs.synthetic_tiny(batch_size=30, dp_devices=8)
    with pytest.raises(ValueError, match='divisible'):
        train_lib.Trainer(cfg, data_lib.make_synthetic())


def test_fused_head_under_multi_device_shard_map(monkeypatch):
    """The fused Pallas head runs (interpret mode) INSIDE the 8-device
    shard_map hot loop: fused math + psum produce finite metrics and
    replicated params across a real multi-device mesh. NOT covered here:
    the kernel's varying-across-mesh (vma) annotations — the checker must
    be OFF because interpret-mode Pallas lowers block indexing through
    dynamic_slice ops it rejects (jax hlo_interpreter limitation); vma is
    type-checked by the real Mosaic lowering on TPU, where every benchmark
    runs the fused path (see make_train_chunk's docstring)."""
    from gmvae_tpu.ops.kernels import fused_elbo
    monkeypatch.setattr(fused_elbo, 'is_supported', lambda: True)
    # dp_devices pinned to 8: per-shard batch 64/8 = 8 = one full tile, so
    # no padding closures are emitted regardless of ambient device count
    cfg = configs.synthetic_tiny(batch_size=64, fused=True, steps=2,
                                 scan_steps=2, enc_hidden=(16, 16),
                                 dec_hidden=(16, 16), dp_devices=N_DEV)
    trainer = train_lib.Trainer(cfg)
    assert trainer.model.head_fn is fused_elbo.fused_mixture_elbo
    chunk = train_lib.make_train_chunk(trainer.model, cfg, trainer.mesh,
                                       trainer.tx, check_vma=False)
    state = trainer.init_state()
    state, m = chunk(state, trainer.x_all, trainer.batch_plan(2),
                     trainer.base_key)
    assert np.isfinite(float(np.asarray(m['elbo'][-1])))
    # params remain replicated after fused-head updates
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_celeba_pod_config_structure_runs_on_virtual_mesh():
    """The celeba_dp16 pod config's STRUCTURE — 4-stage conv arch, K=64,
    D=256, Gaussian likelihood, per-leaf grad clip, sharded dataset
    placement — compiles and trains+evaluates over the 8-device virtual
    mesh. Only scale knobs are shrunk (image 32x32, narrow conv widths,
    tiny batch/steps/dataset): none of them changes the code path, and
    the full-scale shapes run in `tools/dryrun_pod.py --config
    celeba_dp16 --devices 16` (measured green; 132 s of CPU conv at real
    widths is too heavy for the suite). Pod-proof for BASELINE.json:11
    beyond synthetic_tiny shapes."""
    cfg = configs.celeba_dp16(batch_size=16, scan_steps=2, steps=2,
                              eval_every=10**9, ckpt_every=0,
                              eval_samples=1, image_shape=(32, 32, 3),
                              enc_hidden=(16, 32, 64, 128),
                              dec_hidden=(128, 64, 32, 16))
    assert cfg.arch == 'conv' and cfg.n_components == 64
    assert cfg.grad_clip_impl == 'per_leaf'
    assert cfg.data_sharding == 'sharded'
    assert len(cfg.enc_hidden) == 4 and cfg.latent_dim == 256
    ds = data_lib.make_synthetic(image_shape=cfg.image_shape, n_clusters=40,
                                 n_train=64, n_test=32, seed=3)
    trainer = train_lib.Trainer(cfg, ds)
    assert trainer.n_dp == 8
    # sharded placement: each device holds 1/8 of the training rows
    assert trainer.x_all.sharding.spec == P('data')
    state = trainer.init_state()
    state, m = trainer.run_chunk(state, trainer.batch_plan(2))
    assert np.isfinite(float(m['elbo'][-1]))
    ev = trainer.evaluate(state, max_examples=32)
    assert np.isfinite(ev['elbo_nats'])
    assert set(ev) >= {'elbo_nats', 'iwae_nats', 'acc', 'nmi'}


def test_flat_dataset_layout_bit_equal(setup):
    """make_train_chunk accepts the dataset in EITHER layout — image rows
    [N,H,W,C] (what tests and the multihost worker hand it directly) or
    flat rows [N,P] (what Trainer stages: on TPU a u8[N,28,28,1] source
    tiles to T(8,128)(4,1), padding every 784-byte example to a ~4 KB
    strided tile that the per-step batch gather pays per row — measured
    33.9 us/step = 36% of the flagship while-envelope, the step's single
    largest op; flat rows gathered 26% faster in tools/bench_gather.py).
    The body's post-gather reshape restores identical bytes, so the two
    layouts must produce bit-identical trajectories."""
    cfg, model, tx, fresh, ds = setup
    mesh = mesh_lib.make_mesh(dp_devices=N_DEV,
                              devices=jax.devices()[:N_DEV])
    base_key = jax.random.PRNGKey(9)
    rng = np.random.default_rng(5)
    idx = rng.integers(0, ds.train_x.shape[0],
                       size=(3, cfg.batch_size)).astype(np.int32)
    idx_dev = jax.device_put(jnp.asarray(idx),
                             NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS)))
    chunk = train_lib.make_train_chunk(model, cfg, mesh, tx)

    outs = {}
    for layout in ('image', 'flat'):
        xs = np.asarray(ds.train_x)
        if layout == 'flat':
            xs = xs.reshape(xs.shape[0], -1)
        x_all = jax.device_put(jnp.asarray(xs), mesh_lib.replicated(mesh))
        state = train_lib.TrainState(fresh(), tx.init(fresh()), jnp.int32(0))
        state = jax.device_put(state, mesh_lib.replicated(mesh))
        outs[layout] = chunk(state, x_all, idx_dev, base_key)

    si, sf = outs['image'][0], outs['flat'][0]
    for a, b in zip(jax.tree.leaves(si.params), jax.tree.leaves(sf.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(outs['image'][1]['elbo']),
                                  np.asarray(outs['flat'][1]['elbo']))


def test_trainer_stages_dataset_flat(setup):
    """Trainer's device placement stages x_all as flat [N, P] uint8 rows
    for MLP-family configs in BOTH data_sharding modes (the gather-layout
    fast path above; measured +34-65% across the MLP configs), while
    n_local and the sharding spec are unchanged. Conv-family configs keep
    image-shaped staging: their gather is ~2% of the step and the post-
    gather relayout feeding the convs measured svhn −5% (PERF.md r4)."""
    cfg, model, tx, fresh, ds = setup
    tr = train_lib.Trainer(cfg, ds)
    assert tr.x_all.ndim == 2
    assert tr.x_all.shape == (ds.train_x.shape[0],
                              int(np.prod(cfg.image_shape)))
    assert tr.x_all.dtype == jnp.uint8

    cfg_sh = configs.synthetic_tiny(batch_size=64, data_sharding='sharded')
    tr2 = train_lib.Trainer(cfg_sh, ds)
    assert tr2.x_all.ndim == 2
    assert tr2.x_all.sharding.spec == P(mesh_lib.DATA_AXIS)
    assert tr2.n_local == tr2.x_all.shape[0] // tr2.n_dp

    cfg_conv = configs.svhn_conv(batch_size=16, image_shape=(8, 8, 3),
                                 enc_hidden=(4, 8, 16), dec_hidden=(16, 8, 4),
                                 data_sharding='replicated')
    ds_conv = data_lib.make_synthetic(image_shape=(8, 8, 3), n_clusters=2,
                                      n_train=64, seed=2)
    tr3 = train_lib.Trainer(cfg_conv, ds_conv)
    assert tr3.x_all.ndim == 4  # image-shaped staging for conv archs


def test_put_global_device_input_resharded_without_host_fetch(setup, monkeypatch):
    """Single-process put_global with a DEVICE-array input (the batch plans
    ``Trainer.batch_plan`` computes on device) must reshard device-side:
    the old unconditional ``np.asarray`` was a SYNCHRONOUS device->host
    fetch of the whole plan window, measured as a 44% steady-state gap
    between the reused-plan bench and the real fit() pipeline at 20k-step
    scale over the axon tunnel (PERF.md "Bench-vs-fit reconciliation").
    Values and sharding must match the host-numpy path exactly."""
    cfg, model, tx, fresh, ds = setup
    mesh = mesh_lib.make_mesh(dp_devices=N_DEV,
                              devices=jax.devices()[:N_DEV])
    host = np.arange(5 * 64, dtype=np.int32).reshape(5, 64)
    spec = P(None, mesh_lib.DATA_AXIS)
    via_host = mesh_lib.put_global(mesh, spec, host)

    fetched = []
    orig = mesh_lib.np.asarray

    def spy(a, *args, **kw):
        if isinstance(a, jax.Array):
            fetched.append(a)
        return orig(a, *args, **kw)

    monkeypatch.setattr(mesh_lib.np, 'asarray', spy)
    via_dev = mesh_lib.put_global(mesh, spec, jnp.asarray(host))
    monkeypatch.undo()

    assert not fetched, 'device input must not round-trip through the host'
    assert via_dev.sharding.spec == via_host.sharding.spec
    assert via_dev.dtype == via_host.dtype
    np.testing.assert_array_equal(np.asarray(via_dev), np.asarray(via_host))


def test_batch_plan_values_unchanged_by_device_reshard(setup):
    """Trainer.batch_plan (device plan, resharded via the fast path above)
    carries exactly the values batch_plan_host derives for the same window
    — the single-derivation invariant stream==device trajectories rest on
    (CLAUDE.md invariants; tests/test_stream.py proves the trajectory-level
    consequence, this pins the plan itself through the reshard change)."""
    cfg, model, tx, fresh, ds = setup
    tr = train_lib.Trainer(cfg, ds)
    dev = np.asarray(tr.batch_plan(7, start_step=3))
    cfg_s = cfg.replace(data_placement='host_stream')
    host = train_lib.Trainer(cfg_s, ds).batch_plan_host(7, start_step=3)
    np.testing.assert_array_equal(dev, host)
