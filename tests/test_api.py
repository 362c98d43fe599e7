"""Public-API tests: the four verbs round-trip; checkpoints are bit-stable
(SURVEY.md §4.2 tier 7)."""

import os

import jax
import numpy as np
import pytest

import gmvae_tpu
from gmvae_tpu import api, configs
from gmvae_tpu import data as data_lib
from gmvae_tpu import training as train_lib
from gmvae_tpu.utils import checkpoint as ckpt_lib


@pytest.fixture(scope='module')
def short_run(tmp_path_factory):
    cfg = configs.synthetic_tiny(
        steps=60, eval_every=60, ckpt_every=60,
        run_dir=str(tmp_path_factory.mktemp('runs')))
    trainer, state, history = api.train(cfg)
    return cfg, trainer, state, history


def test_package_exports_the_four_verbs():
    for verb in ('train', 'eval_elbo', 'sample', 'reconstruct',
                 'cluster_assign'):
        assert callable(getattr(gmvae_tpu, verb)), verb


def test_eval_elbo_shape_and_keys(short_run):
    _, trainer, state, _ = short_run
    out = api.eval_elbo(trainer, state, max_examples=128)
    assert set(out) >= {'elbo_nats', 'acc', 'nmi'}
    assert np.isfinite(out['elbo_nats'])
    assert 0.0 <= out['acc'] <= 1.0


def test_sample_shapes_and_range(short_run):
    cfg, trainer, state, _ = short_run
    imgs = api.sample(trainer, state, n=5, seed=1)
    assert imgs.shape == (5, *cfg.image_shape)
    assert imgs.dtype == np.float32
    assert np.isfinite(imgs).all()
    # bernoulli likelihood -> sigmoid means in [0, 1]
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # per-component conditional sampling
    imgs_k = api.sample(trainer, state, n=3, component=1)
    assert imgs_k.shape == (3, *cfg.image_shape)


def test_sample_deterministic_given_seed(short_run):
    _, trainer, state, _ = short_run
    a = api.sample(trainer, state, n=4, seed=9)
    b = api.sample(trainer, state, n=4, seed=9)
    np.testing.assert_array_equal(a, b)


def test_reconstruct_roundtrip(short_run):
    cfg, trainer, state, _ = short_run
    x = trainer.dataset.test_x[:8]
    rec = api.reconstruct(trainer, state, x)
    assert rec.shape == (8, *cfg.image_shape)
    assert np.isfinite(rec).all()
    # after training, reconstruction should beat a gray-image baseline
    x01 = x.astype(np.float32) / 255.0
    assert np.abs(rec - x01).mean() < np.abs(0.5 - x01).mean()


def test_cluster_assign_and_metrics(short_run):
    cfg, trainer, state, _ = short_run
    yhat = api.cluster_assign(trainer, state, trainer.dataset.test_x[:256])
    assert yhat.shape == (256,)
    assert yhat.min() >= 0 and yhat.max() < cfg.n_components
    m = api.cluster_metrics(trainer.dataset.test_y[:256], yhat)
    assert set(m) == {'acc', 'nmi'}


def test_checkpoint_roundtrip_bitstable(short_run, tmp_path):
    _, trainer, state, _ = short_run
    path = os.path.join(tmp_path, 'ckpt_test.msgpack')
    tree = trainer.state_to_tree(state)
    ckpt_lib.save_ckpt(path, tree)
    restored = ckpt_lib.restore_ckpt(path, tree)
    for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_resume_continues_identically(tmp_path):
    """restore -> continue == uninterrupted run (determinism, SURVEY.md §5.3)."""
    cfg = configs.synthetic_tiny(steps=40, eval_every=10**9, ckpt_every=0,
                                 run_dir=str(tmp_path))
    trainer = train_lib.Trainer(cfg)

    # uninterrupted: 40 steps
    s_full = trainer.init_state()
    s_full, _ = trainer.run_chunk(s_full, trainer.batch_plan(40))

    # interrupted at 20, checkpointed, restored, continued
    s_half = trainer.init_state()
    s_half, _ = trainer.run_chunk(s_half, trainer.batch_plan(20))
    path = os.path.join(tmp_path, 'mid.msgpack')
    ckpt_lib.save_ckpt(path, trainer.state_to_tree(s_half))
    restored = trainer.tree_to_state(
        ckpt_lib.restore_ckpt(path, trainer.state_to_tree(s_half)))
    assert int(restored.step) == 20
    resumed, _ = trainer.run_chunk(restored,
                                   trainer.batch_plan(20, start_step=20))

    for got, want in zip(jax.tree.leaves(resumed.params),
                         jax.tree.leaves(s_full.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cli_overrides_parse():
    ov = configs.parse_overrides(['steps=100', 'lr=0.01', 'fused=false',
                                  'enc_hidden=(32,32)', 'dataset=mnist'])
    assert ov == {'steps': 100, 'lr': 0.01, 'fused': False,
                  'enc_hidden': (32, 32), 'dataset': 'mnist'}
    with pytest.raises(KeyError):
        configs.parse_overrides(['nope=1'])


def test_cli_overrides_tuple_coercion_by_element_type():
    """Tuple overrides coerce by the default's element type — a future
    float/str tuple field must not be silently int-cast."""
    import dataclasses
    # int tuples (the current fields) still coerce to int
    assert configs.parse_overrides(['image_shape=(8,8,1)']) == {
        'image_shape': (8, 8, 1)}

    @dataclasses.dataclass(frozen=True)
    class Probe(configs.Config):
        float_tup: tuple = (0.5, 1.5)
        str_tup: tuple = ('a', 'b')
        mixed_tup: tuple = (1, 'a')

    orig = configs.Config
    configs.Config = Probe
    try:
        assert configs.parse_overrides(['float_tup=0.25,2.0']) == {
            'float_tup': (0.25, 2.0)}
        assert configs.parse_overrides(['str_tup=x,y']) == {
            'str_tup': ('x', 'y')}
        with pytest.raises(TypeError):
            configs.parse_overrides(['mixed_tup=1,2'])
    finally:
        configs.Config = orig


def test_cli_data_dir_flag_routes_to_loaders(monkeypatch, tmp_path):
    """--data-dir must reach data.load (via $GMVAE_DATA_DIR) before any
    dataset is touched."""
    from gmvae_tpu import api, cli
    seen = {}

    def fake_train(cfg, **kw):
        seen['data_dir'] = os.environ.get('GMVAE_DATA_DIR')
        return None, None, []

    monkeypatch.delenv('GMVAE_DATA_DIR', raising=False)
    monkeypatch.setattr(api, 'train', fake_train)
    rc = cli.main(['train', '--config', 'synthetic_tiny',
                   '--data-dir', str(tmp_path)])
    assert rc == 0 and seen['data_dir'] == str(tmp_path)


def test_compile_cache_resolution(monkeypatch, tmp_path):
    """enable_compile_cache: JAX env var wins untouched; GMVAE_COMPILE_CACHE
    names the dir or disables with '0'; default under ~/.cache."""
    import jax

    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    orig = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv('JAX_COMPILATION_CACHE_DIR', '/already/set')
        assert enable_compile_cache() == '/already/set'
        monkeypatch.delenv('JAX_COMPILATION_CACHE_DIR')

        monkeypatch.setenv('GMVAE_COMPILE_CACHE', '0')
        assert enable_compile_cache() is None

        d = str(tmp_path / 'xla')
        monkeypatch.setenv('GMVAE_COMPILE_CACHE', d)
        assert enable_compile_cache() == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update('jax_compilation_cache_dir', orig)


def test_all_named_configs_construct():
    for name in configs.CONFIGS:
        cfg = configs.get_config(name)
        assert cfg.name == name
        assert cfg.batch_size > 0 and cfg.latent_dim > 0


def test_latent_embed_shapes_and_plot(short_run, tmp_path):
    from gmvae_tpu.utils.logging import save_latent_plot
    cfg, trainer, state, _ = short_run
    z, q = api.latent_embed(trainer, state, trainer.dataset.test_x[:64])
    assert z.shape == (64, cfg.latent_dim)
    assert q.shape == (64, cfg.n_components)
    np.testing.assert_allclose(q.sum(-1), 1.0, rtol=1e-5)
    out = os.path.join(tmp_path, 'latent.png')
    wrote = save_latent_plot(out, z, trainer.dataset.test_y[:64])
    assert not wrote or os.path.getsize(out) > 0


def test_cluster_assign_empty_input(short_run):
    _, trainer, state, _ = short_run
    out = api.cluster_assign(trainer, state, np.zeros((0, 8, 8, 1), np.uint8))
    assert out.shape == (0,)


def test_ckpt_retention_prunes_old_snapshots(tmp_path):
    """cfg.ckpt_keep bounds on-disk snapshots (VERDICT r2 polish #9)."""
    cfg = configs.synthetic_tiny(steps=60, eval_every=10**9, ckpt_every=20,
                                 scan_steps=20, ckpt_keep=2,
                                 run_dir=str(tmp_path))
    api.train(cfg)
    run_dir = os.path.join(cfg.run_dir, cfg.name)
    names = sorted(f for f in os.listdir(run_dir)
                   if f.startswith('ckpt_'))
    assert names == ['ckpt_40.msgpack', 'ckpt_60.msgpack'], names
    # keep=0 retains everything
    cfg2 = cfg.replace(ckpt_keep=0, run_dir=str(tmp_path / 'all'))
    api.train(cfg2)
    run_dir2 = os.path.join(cfg2.run_dir, cfg2.name)
    names2 = sorted(f for f in os.listdir(run_dir2)
                    if f.startswith('ckpt_'))
    assert names2 == ['ckpt_20.msgpack', 'ckpt_40.msgpack',
                      'ckpt_60.msgpack'], names2


def test_cli_eval_with_explicit_ckpt(tmp_path, capsys):
    """--ckpt PATH pins the snapshot (VERDICT r2 polish #9); a missing path
    errors instead of silently using init params."""
    import json

    from gmvae_tpu import cli
    cfg_args = ['--config', 'synthetic_tiny', '--set',
                f'run_dir={tmp_path}', '--set', 'steps=40',
                '--set', 'eval_every=20', '--set', 'scan_steps=20',
                '--set', 'ckpt_every=20', '--set', 'ckpt_keep=0']
    assert cli.main(['train'] + cfg_args) == 0
    capsys.readouterr()
    ck = os.path.join(str(tmp_path), 'synthetic_tiny', 'ckpt_20.msgpack')
    assert cli.main(['eval'] + cfg_args + ['--ckpt', ck]) == 0
    row20 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cli.main(['eval'] + cfg_args) == 0   # latest = step 40
    row40 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row20['elbo_nats'] != row40['elbo_nats']
    assert cli.main(['eval'] + cfg_args + ['--ckpt', '/nope.msgpack']) == 2


def test_batch_plan_windowing_matches_full_plan():
    """Chunked plan generation must reproduce the monolithic plan exactly
    (fit() builds plans per chunk — trajectories must not depend on the
    chunking)."""
    cfg = configs.synthetic_tiny()
    trainer = train_lib.Trainer(cfg, data_lib.make_synthetic(
        image_shape=cfg.image_shape))
    full = np.asarray(trainer.batch_plan(50))
    parts = [np.asarray(trainer.batch_plan(17, start_step=s))
             for s in (0, 17, 34)]
    np.testing.assert_array_equal(np.concatenate(parts)[:50], full)


def test_runlogger_write_gating(tmp_path):
    from gmvae_tpu.utils.logging import RunLogger
    silent = RunLogger(str(tmp_path / 'a'), echo=False, write=False)
    silent.log({'step': 1})
    assert not os.path.exists(silent.path)
    loud = RunLogger(str(tmp_path / 'b'), echo=False)
    loud.log({'step': 1})
    assert os.path.exists(loud.path)


def test_plain_vae_named_config_trains(tmp_path):
    """mnist_vae (K=1 plain-VAE variant, SURVEY.md §1.1 model family) is a
    named config and trains: kl_cat == 0 at K=1, ELBO improves."""
    cfg = configs.get_config(
        'mnist_vae', image_shape=(8, 8, 1), enc_hidden=(32, 32),
        dec_hidden=(32, 32), latent_dim=4, batch_size=32, steps=40,
        scan_steps=20, eval_every=20, ckpt_every=0, fused=False,
        compute_dtype='float32', dataset='synthetic',
        run_dir=str(tmp_path))
    assert cfg.n_components == 1 and cfg.balance_weight == 0.0
    trainer, state, history = api.train(cfg)
    assert np.isfinite(history[-1]['elbo_nats'])
    assert history[-1]['elbo_nats'] > history[0]['elbo_nats'] - 1.0
    # single component -> every assignment is cluster 0
    ids = api.cluster_assign(trainer, state, trainer.dataset.test_x[:64])
    assert (ids == 0).all()


def test_cli_assign_verb(tmp_path, capsys):
    """The serving verb: images in (npz or dataset), {ids, probs, z} out."""
    import json

    from gmvae_tpu import cli
    cfg_args = ['--config', 'synthetic_tiny', '--set',
                f'run_dir={tmp_path}', '--set', 'steps=40',
                '--set', 'eval_every=40', '--set', 'scan_steps=20',
                '--set', 'ckpt_every=40']
    assert cli.main(['train'] + cfg_args) == 0
    capsys.readouterr()
    # dataset default path
    assert cli.main(['assign'] + cfg_args) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row['n'] == 1024 and len(row['cluster_counts']) == 2
    saved = np.load(row['out'])
    assert saved['ids'].shape == (1024,)
    assert saved['probs'].shape == (1024, 2)
    assert saved['z'].shape == (1024, 4)
    np.testing.assert_allclose(saved['probs'].sum(-1), 1.0, atol=1e-5)
    # explicit npz input path
    xs = np.zeros((16, 8, 8, 1), np.uint8)
    np.savez(tmp_path / 'in.npz', x=xs)
    out2 = str(tmp_path / 'out2.npz')
    assert cli.main(['assign'] + cfg_args
                    + ['--input', str(tmp_path / 'in.npz'),
                       '--out', out2]) == 0
    row2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row2['n'] == 16 and row2['out'] == out2


def test_cli_describe_verb(capsys):
    """`describe` summarizes a config (family, param counts, memory
    envelopes) without touching data, checkpoints, or training."""
    import json

    from gmvae_tpu import cli

    assert cli.main(['describe', '--config', 'synthetic_tiny']) == 0
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d['config'] == 'synthetic_tiny' and d['model_family'] == 'gmvae'
    assert d['params_total'] == sum(d['params_by_module'].values()) > 0
    assert set(d['params_by_module']) >= {'encoder', 'decoder', 'k_head'}
    assert d['param_bytes_f32'] == d['params_total'] * 4

    assert cli.main(['describe', '--config', 'synthetic_tiny', '--set',
                     'model_family=deep', '--set', 'w_dim=4',
                     '--set', 'prior_hidden=16']) == 0
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d['model_family'] == 'deep' and not d['fused_head']
    assert 'w_mean_head' in d['params_by_module']


def test_cli_export_verb(tmp_path, capsys):
    """CLI export: restores the latest checkpoint, writes the artifact +
    metadata sidecar, and the artifact reproduces the live assignments."""
    import json

    from jax import export as jexport

    from gmvae_tpu import cli

    cfg_args = ['--config', 'synthetic_tiny',
                '--set', f'run_dir={tmp_path}', '--set', 'steps=40',
                '--set', 'eval_every=40', '--set', 'scan_steps=20',
                '--set', 'ckpt_every=40']
    assert cli.main(['train'] + cfg_args) == 0
    out = os.path.join(tmp_path, 'a.jaxexport')
    assert cli.main(['export'] + cfg_args + ['--verb', 'assign',
                                             '--out', out]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row['out'] == out and row['bytes'] == os.path.getsize(out)
    meta = json.load(open(out + '.json'))
    assert meta['trained_step'] == 40 and meta['verb'] == 'assign'

    fn = jexport.deserialize(open(out, 'rb').read())
    x = np.zeros((5, 8, 8, 1), np.float32)
    ids = np.asarray(fn.call(x))
    assert ids.shape == (5,) and ids.dtype == np.int32


def test_cli_bench_forwards_set_overrides(monkeypatch, capsys):
    """--set scan_steps/steps reach run_bench instead of being replaced
    by the harness defaults."""
    from gmvae_tpu import benchmark, cli

    seen = {}

    def fake(cfg, **kw):
        seen.update(kw)
        seen['cfg_scan'] = cfg.scan_steps
        return {'metric': 'm', 'value': 1.0, 'unit': 'u'}

    monkeypatch.setattr(benchmark, 'run_bench', fake)
    assert cli.main(['bench', '--config', 'synthetic_tiny',
                     '--set', 'scan_steps=7', '--set', 'steps=21']) == 0
    assert seen['scan_steps'] == 7 and seen['steps'] == 21


def test_bool_override_typo_rejected():
    from gmvae_tpu import configs as cfg_lib
    with pytest.raises(ValueError, match='boolean'):
        cfg_lib.parse_overrides(['fused=ture'])
    assert cfg_lib.parse_overrides(['fused=0']) == {'fused': False}
    assert cfg_lib.parse_overrides(['fused=YES']) == {'fused': True}


def test_stray_ckpt_name_tolerated(tmp_path):
    from gmvae_tpu.utils import checkpoint as ckpt_lib
    (tmp_path / 'ckpt_40.msgpack').write_bytes(b'x')
    (tmp_path / 'ckpt_best.msgpack').write_bytes(b'x')  # user copy
    # a NUMBERED user copy must not shadow the canonical snapshot in
    # latest_ckpt nor consume prune_ckpts' keep budget (ADVICE r3)
    (tmp_path / 'ckpt_500_best.msgpack').write_bytes(b'x')
    (tmp_path / 'ckpt_100.msgpack').write_bytes(b'x')
    assert ckpt_lib.latest_ckpt(str(tmp_path)).endswith('ckpt_100.msgpack')
    ckpt_lib.prune_ckpts(str(tmp_path), keep=1)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ['ckpt_100.msgpack', 'ckpt_500_best.msgpack',
                    'ckpt_best.msgpack']


def test_latent_embed_empty_input(tmp_path):
    cfg = configs.synthetic_tiny(run_dir=str(tmp_path))
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    z, probs = api.latent_embed(trainer, state,
                                np.zeros((0, 8, 8, 1), np.uint8))
    assert z.shape == (0, cfg.latent_dim)
    assert probs.shape == (0, cfg.n_components)
    ids = api.cluster_assign(trainer, state, np.zeros((0, 8, 8, 1),
                                                      np.uint8))
    assert ids.shape == (0,)


def test_api_verbs_cache_their_jits(tmp_path):
    """Repeat api calls on one trainer reuse the compiled fn (jit caches
    key on the wrapper object, so per-call closures re-compiled)."""
    cfg = configs.synthetic_tiny(run_dir=str(tmp_path))
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    api.sample(trainer, state, 4)
    api.reconstruct(trainer, state, trainer.dataset.test_x[:4])
    cache = trainer._api_jit_cache
    fn_before = cache['sample']
    api.sample(trainer, state, 4)
    assert cache['sample'] is fn_before
    assert set(cache) >= {'sample', 'reconstruct'}
