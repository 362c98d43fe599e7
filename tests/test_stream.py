"""Host-streaming data placement (``data_placement='host_stream'``).

The dataset stays in host RAM; each scan-chunk's batches are gathered on
host from the SAME index plan the device-resident path reads and staged to
the device with an async put (training.Trainer.stage_batches). The binding
property is bit-identical trajectories vs the default device placement —
streaming is a memory-capacity feature, not a numerics change.
"""

import jax
import numpy as np
import pytest

from gmvae_tpu import configs
from gmvae_tpu import training as train_lib


def _fit(tmp, placement, **kw):
    cfg = configs.synthetic_tiny(
        steps=120, eval_every=60, ckpt_every=0,
        data_placement=placement, run_dir=str(tmp / placement), **kw)
    return train_lib.fit(cfg)


def test_stream_trajectory_matches_device_placement(tmp_path):
    """Same seed, same plan -> bit-identical params and eval metrics."""
    _, st_dev, hist_dev = _fit(tmp_path, 'device')
    _, st_str, hist_str = _fit(tmp_path, 'host_stream')
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        st_dev.params, st_str.params)
    for rd, rs in zip(hist_dev, hist_str):
        assert rd['elbo_nats'] == rs['elbo_nats']
        assert rd['step'] == rs['step']


def test_stream_on_multidevice_mesh(tmp_path):
    """Streaming shards staged batches over the full 8-device data axis and
    still matches the device-resident run bit-for-bit."""
    n = jax.device_count()
    assert n == 8, 'conftest forces 8 fake devices'
    _, st_dev, _ = _fit(tmp_path, 'device', dp_devices=n)
    _, st_str, _ = _fit(tmp_path, 'host_stream', dp_devices=n)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        st_dev.params, st_str.params)


def test_stream_dataset_never_device_resident(tmp_path):
    cfg = configs.synthetic_tiny(data_placement='host_stream',
                                 run_dir=str(tmp_path))
    tr = train_lib.Trainer(cfg)
    assert tr.x_all is None
    assert isinstance(tr.train_x_host, np.ndarray)
    # staging one chunk produces a [S, B, H, W, C] device array sharded
    # over the batch axis, with exactly the plan's rows
    idx = tr.batch_plan_host(3)
    staged = tr.stage_batches(idx)
    assert staged.shape == (3, cfg.batch_size, *cfg.image_shape)
    np.testing.assert_array_equal(np.asarray(staged)[0],
                                  tr.train_x_host[idx[0]])


def test_batch_plan_host_matches_device_plan(tmp_path):
    """The host-side plan (what streaming gathers from) is value-identical
    to the device-resident plan (what the in-program gather reads) — the
    invariant that makes stream trajectories bit-equal."""
    cfg = configs.synthetic_tiny(run_dir=str(tmp_path))
    tr = train_lib.Trainer(cfg)
    np.testing.assert_array_equal(np.asarray(tr.batch_plan(7)),
                                  tr.batch_plan_host(7))
    np.testing.assert_array_equal(np.asarray(tr.batch_plan(5, start_step=3)),
                                  tr.batch_plan_host(5, start_step=3))


def test_stream_resume_matches_uninterrupted(tmp_path):
    cfg = configs.synthetic_tiny(
        steps=120, eval_every=60, ckpt_every=60,
        data_placement='host_stream', run_dir=str(tmp_path))
    _, st_a, _ = train_lib.fit(cfg)
    cfg_b = cfg.replace(name='resumed')
    train_lib.fit(cfg_b.replace(steps=60))
    _, st_b, _ = train_lib.fit(cfg_b, resume=True)
    assert int(st_b.step) == 120
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        st_a.params, st_b.params)


def test_stream_rejects_sharded_dataset(tmp_path):
    cfg = configs.synthetic_tiny(data_placement='host_stream',
                                 data_sharding='sharded',
                                 run_dir=str(tmp_path))
    with pytest.raises(ValueError, match='host_stream'):
        train_lib.Trainer(cfg)


def test_bench_harness_supports_stream(tmp_path):
    from gmvae_tpu import benchmark
    cfg = configs.synthetic_tiny(data_placement='host_stream',
                                 run_dir=str(tmp_path))
    res = benchmark.run_bench(cfg, steps=20, scan_steps=10, warmup_chunks=1)
    assert res['value'] > 0
