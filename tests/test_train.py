"""Integration + golden-regression tests (SURVEY.md §4.2 tiers 4-5)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmvae_tpu import configs
from gmvae_tpu import data as data_lib
from gmvae_tpu import training as train_lib

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'golden')


def _tiny_cfg(**kw):
    return configs.synthetic_tiny(run_dir='/tmp/gmvae_test_runs').replace(**kw)


@pytest.fixture(scope='module')
def planted_run(tmp_path_factory):
    """Train 300 steps on the 2-cluster planted dataset (module-scoped:
    several tests share this run)."""
    cfg = _tiny_cfg(elbo_form='structured', hard_gumbel=False,
                    run_dir=str(tmp_path_factory.mktemp('runs')))
    trainer, state, history = train_lib.fit(cfg)
    return cfg, trainer, state, history


def test_elbo_improves_and_recovers_planted_clusters(planted_run):
    _, _, _, history = planted_run
    elbos = [h['elbo_nats'] for h in history]
    assert elbos[-1] > elbos[0] + 0.5, elbos       # ELBO strictly improves
    assert history[-1]['acc'] > 0.95, history[-1]  # 2 planted clusters found
    assert history[-1]['nmi'] > 0.7, history[-1]


def test_mixture_form_also_learns():
    cfg = _tiny_cfg(elbo_form='mixture', hard_gumbel=True, steps=300)
    _, _, history = train_lib.fit(cfg)
    assert history[-1]['elbo_nats'] > history[0]['elbo_nats']
    assert history[-1]['acc'] > 0.8, history[-1]


def test_training_is_deterministic():
    cfg = _tiny_cfg(steps=40, eval_every=40, ckpt_every=0)
    _, s1, h1 = train_lib.fit(cfg)
    _, s2, h2 = train_lib.fit(cfg)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(s1.params)[0]),
        np.asarray(jax.tree.leaves(s2.params)[0]))
    assert h1[-1]['elbo_nats'] == h2[-1]['elbo_nats']


def test_nan_free_at_low_temperature():
    # tau driven to the floor immediately: the Gumbel-softmax NaN hotspot
    # (SURVEY.md §7.3 hard part #2)
    cfg = _tiny_cfg(steps=60, eval_every=60, tau0=0.51, tau_min=0.5,
                    tau_anneal=1.0, ckpt_every=0)
    _, state, history = train_lib.fit(cfg)
    assert np.isfinite(history[-1]['elbo_nats'])
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_kl_warmup_schedule():
    import jax.numpy as jnp
    cfg = _tiny_cfg(kl_warmup_steps=100)
    _, beta0 = train_lib.schedules(cfg, jnp.int32(0))
    _, beta50 = train_lib.schedules(cfg, jnp.int32(49))
    _, beta_end = train_lib.schedules(cfg, jnp.int32(1000))
    assert float(beta0) == pytest.approx(0.01)
    assert float(beta50) == pytest.approx(0.5)
    assert float(beta_end) == 1.0


@pytest.mark.parametrize('fname', ['elbo_synthetic.json',
                                   'elbo_synthetic_hard.json',
                                   'elbo_synthetic_deep.json'])
def test_golden_elbo_trajectory(fname):
    """Seed-frozen 50-step ELBO trajectories vs checked-in golden files —
    guards numerics refactors and kernel swaps (SURVEY.md §4.2 tier 5),
    on both the easy fixture and the overlapping-cluster hard fixture.
    Regenerate deliberately with: python tests/make_golden.py"""
    path = os.path.join(GOLDEN_DIR, fname)
    if not os.path.exists(path):
        pytest.skip('golden file not generated yet')
    with open(path) as f:
        golden = json.load(f)
    cfg = configs.get_config(golden.get('config', 'synthetic_tiny'),
                             run_dir='/tmp/gmvae_test_runs')
    # the golden contract IS a per-step trajectory, so stacked metrics are
    # pinned here regardless of the named config's production
    # metrics_mode (params math is identical across modes —
    # test_metrics_mode_mean_params_bit_equal)
    cfg = cfg.replace(**golden['config_overrides']).replace(
        metrics_mode='stacked')
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    idx = trainer.batch_plan(golden['steps'])
    state, metrics = trainer.run_chunk(state, idx)
    got = np.asarray(metrics['elbo'])
    want = np.asarray(golden['elbo'], np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_clip_by_leaf_norm():
    import jax.numpy as jnp
    tx = train_lib.clip_by_leaf_norm(1.0)
    grads = {'big': jnp.full((4,), 10.0), 'small': jnp.full((4,), 0.01)}
    out, _ = tx.update(grads, tx.init(grads))
    np.testing.assert_allclose(float(jnp.linalg.norm(out['big'])), 1.0,
                               rtol=1e-6)  # clipped to the max norm
    np.testing.assert_array_equal(np.asarray(out['small']),
                                  np.asarray(grads['small']))  # untouched


def test_grad_clip_impl_validated():
    cfg = _tiny_cfg(grad_clip=1.0, grad_clip_impl='nope')
    with pytest.raises(ValueError, match='grad_clip_impl'):
        train_lib.make_optimizer(cfg)
    for impl in ('global', 'per_leaf', 'value'):
        train_lib.make_optimizer(_tiny_cfg(grad_clip=1.0,
                                           grad_clip_impl=impl))


def test_balance_regularizer_spreads_component_usage():
    """With a strong balance weight, batch-mean q(k|x) approaches uniform."""
    import gmvae_tpu.api as api
    cfg = _tiny_cfg(steps=150, eval_every=150, ckpt_every=0,
                    balance_weight=20.0)
    trainer, state, _ = train_lib.fit(cfg)
    yhat = api.cluster_assign(trainer, state, trainer.dataset.test_x[:512])
    counts = np.bincount(yhat, minlength=cfg.n_components)
    # both components used (no collapse)
    assert (counts > 0.2 * counts.sum() / cfg.n_components).all(), counts


def test_multisample_eval_reduces_variance_and_iwae_bounds():
    cfg = _tiny_cfg(steps=60, eval_every=60, ckpt_every=0, eval_samples=8)
    trainer, state, history = train_lib.fit(cfg)
    row = history[-1]
    assert 'iwae_nats' in row
    # IWAE multi-sample bound is at least as tight as the mean ELBO
    assert row['iwae_nats'] >= row['elbo_nats'] - 1e-4, row


def test_adam_lowmem_f32_storage_matches_optax_adam():
    """With float32 storage the lowmem transform IS optax.adam: the math
    (blend, bias correction, eps placement) is validated exactly; the only
    thing the bfloat16 mode then adds is storage rounding."""
    import optax
    key = jax.random.PRNGKey(0)
    params = {'w': jax.random.normal(key, (7, 5)),
              'b': jnp.zeros((5,), jnp.float32)}
    ref = optax.adam(1e-3)
    low = optax.chain(
        train_lib.scale_by_adam_lowmem(state_dtype=jnp.float32),
        optax.scale(-1e-3))
    s_ref, s_low = ref.init(params), low.init(params)
    p_ref, p_low = params, params
    for i in range(5):
        g = jax.tree.map(
            lambda p, j=i: jax.random.normal(
                jax.random.fold_in(key, 100 + j), p.shape), params)
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_low, s_low = low.update(g, s_low, p_low)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_low = optax.apply_updates(p_low, u_low)
        for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_low)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_adam_lowmem_bf16_trains_and_checkpoints():
    """opt_state_dtype='bfloat16': moments are stored bf16, training still
    recovers the planted clusters, and the bf16 optimizer state survives a
    checkpoint save->restore->continue bit-stably."""
    from gmvae_tpu.utils import checkpoint as ckpt_lib
    cfg = _tiny_cfg(steps=300, eval_every=300, ckpt_every=0,
                    opt_state_dtype='bfloat16')
    trainer, state, history = train_lib.fit(cfg)
    moments = [s for s in jax.tree.leaves(state.opt_state)
               if hasattr(s, 'dtype') and s.dtype == jnp.bfloat16]
    assert moments, 'no bf16 moment leaves found in opt_state'
    assert history[-1]['acc'] > 0.95, history[-1]
    # params themselves stay f32 (only moment STORAGE is bf16)
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32

    path = os.path.join(cfg.run_dir, 'lowmem_ckpt.msgpack')
    ckpt_lib.save_ckpt(path, trainer.state_to_tree(state))
    restored = ckpt_lib.restore_ckpt(path, trainer.state_to_tree(state))
    for a, b in zip(jax.tree.leaves(trainer.state_to_tree(state)),
                    jax.tree.leaves(restored)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adam_lowmem_trajectory_close_to_f32():
    """Storage rounding perturbs, but must not derail, the trajectory."""
    cfg32 = _tiny_cfg(steps=120, eval_every=120, ckpt_every=0)
    cfg16 = cfg32.replace(opt_state_dtype='bfloat16')
    _, _, h32 = train_lib.fit(cfg32)
    _, _, h16 = train_lib.fit(cfg16)
    e32, e16 = h32[-1]['elbo_nats'], h16[-1]['elbo_nats']
    assert abs(e32 - e16) / abs(e32) < 0.05, (e32, e16)


def test_opt_state_dtype_validated():
    with pytest.raises(ValueError):
        train_lib.make_optimizer(_tiny_cfg(opt_state_dtype='float16'))


def test_resume_migrates_opt_state_dtype(tmp_path):
    """A checkpoint written with f32 Adam moments resumes cleanly into a
    bf16-moment config (and vice versa): tree_to_state casts restored
    opt-state leaves to the config's optimizer dtypes — without the cast,
    lax.scan's carry dtype mismatches mid-resume (review finding r3)."""
    cfg32 = _tiny_cfg(steps=40, eval_every=40, ckpt_every=40,
                      run_dir=str(tmp_path))
    train_lib.fit(cfg32)
    cfg16 = cfg32.replace(steps=80, opt_state_dtype='bfloat16')
    _, state2, _ = train_lib.fit(cfg16, resume=True)
    assert int(state2.step) == 80
    assert any(getattr(leaf, 'dtype', None) == jnp.bfloat16
               for leaf in jax.tree.leaves(state2.opt_state))
    # and back: the bf16 run's checkpoint resumes into the f32 config
    _, state3, _ = train_lib.fit(cfg32.replace(steps=120), resume=True)
    assert int(state3.step) == 120
    for leaf in jax.tree.leaves(state3.opt_state):
        assert getattr(leaf, 'dtype', None) != jnp.bfloat16


def test_pad_to_multiple_pads_past_double():
    """multiple > 2n requires tiling, not a single x[:rem] slice."""
    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    padded, n = train_lib.pad_to_multiple(x, 64)
    assert n == 10 and padded.shape == (64, 3)
    np.testing.assert_array_equal(padded[:10], x)
    np.testing.assert_array_equal(padded[10:20], x)  # tiled copies

    same, n2 = train_lib.pad_to_multiple(x, 5)
    assert n2 == 10 and same.shape == (10, 3)


def test_evaluate_with_test_set_smaller_than_half_batch(tmp_path):
    """An eval set smaller than half the eval batch must still pad to the
    full batch (a device-count-divisible global array)."""
    cfg = configs.synthetic_tiny(steps=20, eval_every=10**9, ckpt_every=0,
                                 run_dir=str(tmp_path))
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    out = trainer.evaluate(state, max_examples=10)  # batch_size is 64
    assert np.isfinite(out['elbo_nats'])


def test_fit_with_eval_disabled(tmp_path):
    """eval_every=0 disables the eval cadence (symmetric with
    ckpt_every=0) instead of dividing by zero."""
    cfg = configs.synthetic_tiny(steps=40, eval_every=0, ckpt_every=0,
                                 scan_steps=20, run_dir=str(tmp_path))
    _, state, history = train_lib.fit(cfg)
    assert int(state.step) == 40
    assert history == []


def test_chunk_plan_window_floored_at_several_chunks():
    """At extreme batch sizes the ~8 MB index budget alone would collapse
    the plan window to ONE chunk — regenerating the plan (a host
    round-trip) every chunk, the exact stall super-chunking exists to
    avoid (ADVICE r3). The window is floored at 8 chunks instead."""
    cfg = configs.synthetic_tiny(batch_size=32, scan_steps=5)
    trainer = train_lib.Trainer(cfg)
    # 2M // batch == 0 < chunk: the byte budget alone would give window=chunk
    trainer.cfg = cfg.replace(batch_size=4_000_000)
    calls = []

    def fake_plan(n_steps, start_step=0):
        calls.append((n_steps, start_step))
        return np.zeros((n_steps, 4), np.int32)

    trainer.batch_plan = fake_plan
    chunks = list(trainer.iter_chunk_plans(0, 50))
    assert len(chunks) == 10 and all(s == 5 for s, _ in chunks)
    # floor = 8 chunks = 40 steps -> exactly two generations, not ten
    assert calls == [(40, 0), (40, 40)]


def test_evaluate_staged_sweep_bit_equals_per_batch_protocol(tmp_path):
    """The staged eval sweep (one put_global per super-stage, device-side
    batch slices, single end fetch — VERDICT r3 #5) must reproduce the old
    per-batch put->dispatch->fetch protocol BIT-FOR-BIT: same per-batch
    keys, same batch bytes, same jitted eval_step. Also pins the staging
    shape: no per-batch put_global (multi-stage path exercised by
    shrinking the stage budget)."""
    from jax.sharding import PartitionSpec as P
    from gmvae_tpu.parallel import mesh as mesh_lib

    cfg = configs.synthetic_tiny(steps=20, eval_every=10**9, ckpt_every=0,
                                 batch_size=32, run_dir=str(tmp_path))
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    xs = trainer.dataset.test_x[:100]          # pads to 4 batches of 32
    ys = trainer.dataset.test_y[:100]

    # reference: the pre-staging protocol, inlined
    bs = cfg.batch_size
    xp, n = train_lib.pad_to_multiple(np.asarray(xs), bs)
    key = jax.random.PRNGKey(17)
    step_arr = jnp.int32(int(state.step))
    ref_e, ref_iw, ref_y = [], [], []
    for i in range(0, xp.shape[0], bs):
        k = jax.random.fold_in(key, i)
        batch = mesh_lib.put_global(trainer.mesh, P('data'), xp[i:i + bs])
        e, iw, y = trainer.eval_step(state.params, batch, k, step_arr)
        ref_e.append(np.asarray(e))
        ref_iw.append(np.asarray(iw))
        ref_y.append(np.asarray(y))
    ref = {'elbo_nats': float(np.concatenate(ref_e)[:n].mean()),
           'iwae_nats': float(np.concatenate(ref_iw)[:n].mean())}

    puts = []
    orig_put = mesh_lib.put_global

    def counting_put(mesh, spec, arr):
        puts.append(np.asarray(arr).shape)
        return orig_put(mesh, spec, arr)

    train_lib.mesh_lib.put_global = counting_put
    try:
        out = train_lib.evaluate(trainer.eval_step, cfg, trainer.mesh,
                                 state.params, xs, ys, int(state.step))
        assert puts == [(4, bs, 8, 8, 1)]      # ONE staged put, not four
        assert out['elbo_nats'] == ref['elbo_nats']
        assert out['iwae_nats'] == ref['iwae_nats']

        # multi-stage path (budget forces 2-batch stages): same numbers
        puts.clear()
        old_budget = train_lib._EVAL_STAGE_BYTES
        train_lib._EVAL_STAGE_BYTES = 2 * bs * 8 * 8
        try:
            out2 = train_lib.evaluate(trainer.eval_step, cfg, trainer.mesh,
                                      state.params, xs, ys, int(state.step))
        finally:
            train_lib._EVAL_STAGE_BYTES = old_budget
        assert puts == [(2, bs, 8, 8, 1), (2, bs, 8, 8, 1)]
        assert out2 == out
    finally:
        train_lib.mesh_lib.put_global = orig_put


def _run_chunk_with(cfg, n_steps=30):
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    state, m = trainer.run_chunk(state, trainer.batch_plan(n_steps))
    return state, m


def test_metrics_mode_mean_params_bit_equal():
    """metrics_mode='mean' changes ONLY the metrics plumbing: trained
    params are bit-identical to 'stacked', the returned means equal the
    stacked per-step means, and the [1] shape keeps ``m['elbo'][-1]``
    fences working (training._scan_with_metrics)."""
    cfg = _tiny_cfg(steps=30, eval_every=10**9, ckpt_every=0)
    s_stk, m_stk = _run_chunk_with(cfg)
    s_mean, m_mean = _run_chunk_with(cfg.replace(metrics_mode='mean'))
    for a, b in zip(jax.tree.leaves(s_stk.params),
                    jax.tree.leaves(s_mean.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in train_lib.METRIC_KEYS:
        assert np.asarray(m_stk[k]).shape == (30,)
        assert np.asarray(m_mean[k]).shape == (1,)
        np.testing.assert_allclose(float(np.asarray(m_mean[k])[-1]),
                                   float(np.asarray(m_stk[k]).mean()),
                                   rtol=1e-5, atol=1e-6)


def test_metrics_mode_mean_stream_placement():
    """The streaming chunk honors metrics_mode too, at the same params
    bit-equality (stream==device composes with mean metrics)."""
    cfg = _tiny_cfg(steps=20, eval_every=10**9, ckpt_every=0,
                    metrics_mode='mean')
    s_dev, m_dev = _run_chunk_with(cfg, 20)
    tr = train_lib.Trainer(cfg.replace(data_placement='host_stream'))
    st = tr.init_state()
    st, m_st = tr.run_chunk(st, tr.stage_batches(tr.batch_plan_host(20)))
    for a, b in zip(jax.tree.leaves(s_dev.params), jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(m_st['elbo']).shape == (1,)
    np.testing.assert_array_equal(np.asarray(m_st['elbo']),
                                  np.asarray(m_dev['elbo']))


def test_scan_chunk_size_params_bit_equal():
    """scan_steps is a pure dispatch-granularity knob: the batch-index
    stream comes from one prefix-stable derivation (epoch_batch_indices),
    and the scan body compiles identically at any trip count, so params
    after N steps are BIT-identical across chunk sizes. This is the
    invariance that lets tools/autotune_scan.py tune scan_steps per config
    without re-proving trained trajectories (unlike scan_unroll, which
    reorders accumulation — next test)."""
    cfg = _tiny_cfg(steps=40, eval_every=10**9, ckpt_every=0)

    def train(scan_steps):
        tr = train_lib.Trainer(cfg.replace(scan_steps=scan_steps))
        st = tr.init_state()
        m = None
        for _, idx in tr.iter_chunk_plans(0, 40):
            st, m = tr.run_chunk(st, idx)
        return st, m

    s8, m8 = train(8)
    s20, m20 = train(20)
    for a, b in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s20.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # last step's metrics agree too (stacked mode: compare final entries)
    np.testing.assert_array_equal(np.asarray(m8['elbo'])[-1],
                                  np.asarray(m20['elbo'])[-1])


def test_scan_unroll_trajectory_close():
    """scan_unroll lets XLA fuse across unrolled iterations, which REORDERS
    float accumulation — measured max param delta ~6e-8 (1 ulp) after 24
    CPU steps, i.e. the same chaos class as kernel-tiling changes. That is
    why every config defaults to unroll=1 (bit-determinism invariant) and
    the knob is an experiment surface, not a production default. This test
    pins both facts: trajectories stay CLOSE, and the knob works."""
    cfg = _tiny_cfg(steps=24, eval_every=10**9, ckpt_every=0)
    s1, m1 = _run_chunk_with(cfg, 24)
    s2, m2 = _run_chunk_with(cfg.replace(scan_unroll=4), 24)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m1['elbo']),
                               np.asarray(m2['elbo']), rtol=1e-4, atol=1e-3)


def test_chunk_cfg_validation():
    for bad in (dict(metrics_mode='running'), dict(scan_unroll=0)):
        cfg = _tiny_cfg(**bad)
        trainer_err = None
        try:
            train_lib.Trainer(cfg)
        except ValueError as e:
            trainer_err = e
        assert trainer_err is not None, bad


def test_fused_noise_config_plumbing():
    """cfg.fused_noise drives the head's noise_mode (the matched-noise
    parity protocol, VERDICT r3 #2): 'auto' keeps the bare fused head,
    'xla'/'threefry' bind an explicit noise_mode, bad values raise."""
    import functools
    from unittest import mock
    from gmvae_tpu.ops.kernels import fused_elbo

    cfg = configs.synthetic_tiny(fused=True)
    with mock.patch.object(fused_elbo, 'is_supported', lambda: True):
        m_auto = train_lib.make_model(cfg)
        assert m_auto.head_fn is fused_elbo.fused_mixture_elbo
        m_xla = train_lib.make_model(cfg.replace(fused_noise='xla'))
        assert isinstance(m_xla.head_fn, functools.partial)
        assert m_xla.head_fn.func is fused_elbo.fused_mixture_elbo
        assert m_xla.head_fn.keywords == {'noise_mode': 'xla'}
    with pytest.raises(ValueError, match='fused_noise'):
        train_lib.make_model(cfg.replace(fused_noise='hw'))
