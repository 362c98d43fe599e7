"""Four-process pod-topology DP worker for tests/test_multihost.py
(VERDICT r4 #5: multi-host evidence stopped at 2 processes; the
celeba_dp16 target is a 4-host x 4-chip v5e-16 — BASELINE.json:11,
SURVEY.md §5.8).

Run as: python worker_pod4.py <process_id> <port> <workdir>  (x4,
concurrently), with JAX_PLATFORMS=cpu, 2 fake devices per process -> an
8-device global mesh across 4 processes. Drives the celeba_dp16
STRUCTURE scaled down (conv arch + gaussian likelihood +
data_sharding='sharded' + grad_clip_impl='per_leaf') with a dataset size
that divides by NEITHER the process count nor the device count — the
regime where off-by-one slicing and non-power-of-two split bugs in
process_shard/put_sharded would first appear:

  1. process_shard coverage at n=131 (131 % 4 != 0): the four slices
     partition [0, n) exactly — allgathered and asserted on every process;
  2. sharded-dataset train chunk at n_train=132 (pad_to_multiple -> 136,
     17 rows/device, 34 rows/process): params bit-identical on all four
     processes after the cross-process psum;
  3. Trainer.evaluate on the global mesh at a non-divisible
     max_examples=100: metrics identical + finite on all processes;
  4. fit() with eval cadence + checkpointing, then cross-process
     save -> restore -> continue: resumed params bit-equal the
     uninterrupted run and identical across processes;
  5. host_stream placement at process_count=4: staged-batch chunk
     reproduces the device-placement chunk bit-for-bit.
"""
import os, sys
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
os.environ['JAX_PLATFORMS'] = 'cpu'
pid = int(sys.argv[1])
workdir = sys.argv[3]
import jax
jax.distributed.initialize(coordinator_address='localhost:' + sys.argv[2],
                           num_processes=4, process_id=pid)
import numpy as np
from jax.experimental import multihost_utils
from gmvae_tpu import configs, training as train_lib
from gmvae_tpu import data as data_lib
from gmvae_tpu.parallel import mesh as mesh_lib

print(f'[p{pid}] global_devices={jax.device_count()} '
      f'local={jax.local_device_count()} procs={jax.process_count()}',
      flush=True)
assert jax.process_count() == 4 and jax.device_count() == 8

# --- 1. process_shard partitions a non-divisible n exactly (p=4) ----------
n_odd = 131  # 131 % 4 = 3: slice sizes 32/33/33/33
sl = mesh_lib.process_shard(n_odd)
bounds = multihost_utils.process_allgather(
    np.array([sl.start, sl.stop], dtype=np.int64))
shard_cover = (bounds[0][0] == 0 and bounds[-1][1] == n_odd
               and all(bounds[i][1] == bounds[i + 1][0] for i in range(3)))
shard_cover = bool(shard_cover)

# --- celeba_dp16 structure, scaled down ------------------------------------
# Keeps exactly the fields that shape the distributed run: conv arch,
# gaussian likelihood (binarize off), data_sharding='sharded',
# grad_clip_impl='per_leaf', bf16-capable head off (fused=False: CPU test).
cfg = configs.celeba_dp16(
    dataset='synthetic', image_shape=(8, 8, 3),
    enc_hidden=(8, 16), dec_hidden=(16, 8),
    latent_dim=8, n_components=4, batch_size=32, scan_steps=2,
    fused=False, compute_dtype='float32', seed=0)
assert cfg.data_sharding == 'sharded' and cfg.grad_clip_impl == 'per_leaf'
# 132 % 8 != 0: pad_to_multiple wraps to 136 -> 17 rows/device
ds = data_lib.make_synthetic(image_shape=cfg.image_shape, n_clusters=4,
                             n_train=132, n_test=128, seed=0)

# --- 2. sharded train chunk: cross-process psum, per-leaf clip -------------
tr = train_lib.Trainer(cfg, ds)
assert tr.x_all.addressable_shards[0].data.shape[0] == 136 // 8, tr.x_all
st = tr.init_state()
st, m = tr.run_chunk(st, tr.batch_plan(2))
leaf = np.asarray(jax.tree.leaves(st.params)[0].addressable_shards[0].data)
g = multihost_utils.process_allgather(leaf)
params_same = bool(all(np.array_equal(g[0], g[i]) for i in range(1, 4)))
elbo = np.asarray(m['elbo'].addressable_shards[0].data)
elbo_finite = bool(np.isfinite(elbo).all())

# --- 3. global-mesh eval at non-divisible max_examples ---------------------
ev = tr.evaluate(st, max_examples=100)
ev_v = np.array([ev['elbo_nats'], ev['iwae_nats'], ev['acc'], ev['nmi']])
ev_g = multihost_utils.process_allgather(ev_v)
eval_same = bool(all(np.allclose(ev_g[0], ev_g[i]) for i in range(1, 4)))
eval_finite = bool(np.isfinite(ev_g).all())

# --- 4. fit + cross-process checkpoint resume ------------------------------
cfg_fit = cfg.replace(name='pod4_fit', steps=6, scan_steps=2, eval_every=2,
                      ckpt_every=4, run_dir=os.path.join(workdir, 'runs'))
_, st_a, hist_a = train_lib.fit(cfg_fit, ds)            # 6 steps straight
assert [h['step'] for h in hist_a] == [2, 4, 6], hist_a
cfg_fit_b = cfg_fit.replace(name='pod4_fit_b')
train_lib.fit(cfg_fit_b.replace(steps=4), ds)           # writes ckpt_4
_, st_b, hist_b = train_lib.fit(cfg_fit_b, ds, resume=True)
assert int(st_b.step) == 6, int(st_b.step)
la = np.asarray(jax.tree.leaves(st_a.params)[0].addressable_shards[0].data)
lb = np.asarray(jax.tree.leaves(st_b.params)[0].addressable_shards[0].data)
resume_match = bool(np.array_equal(la, lb))
g_fit = multihost_utils.process_allgather(lb)
fit_same = bool(all(np.array_equal(g_fit[0], g_fit[i]) for i in range(1, 4)))
last = np.array([hist_b[-1]['elbo_nats'], hist_b[-1]['acc']])
g_last = multihost_utils.process_allgather(last)
fit_eval_same = bool(all(np.allclose(g_last[0], g_last[i])
                         for i in range(1, 4)))

# --- 5. host_stream == device placement at p=4 ------------------------------
# host_stream requires replicated sharding (training.py invariant); both
# arms run the replicated variant of the same celeba-structure config.
cfg_dev = cfg.replace(name='pod4_dev', data_sharding='replicated')
cfg_st = cfg_dev.replace(name='pod4_stream', data_placement='host_stream')
tr_st = train_lib.Trainer(cfg_st, ds)
st_st = tr_st.init_state()
st_st, _ = tr_st.run_chunk(st_st,
                           tr_st.stage_batches(tr_st.batch_plan_host(2)))
tr_dev = train_lib.Trainer(cfg_dev, ds)
st_dev = tr_dev.init_state()
st_dev, _ = tr_dev.run_chunk(st_dev, tr_dev.batch_plan(2))
l_st = np.asarray(
    jax.tree.leaves(st_st.params)[0].addressable_shards[0].data)
l_dev = np.asarray(
    jax.tree.leaves(st_dev.params)[0].addressable_shards[0].data)
stream_eq_dev = bool(np.array_equal(l_st, l_dev))
g_st = multihost_utils.process_allgather(l_st)
stream_same = bool(all(np.array_equal(g_st[0], g_st[i]) for i in range(1, 4)))

print(f'[p{pid}] RESULT shard_cover={shard_cover} '
      f'params_identical={params_same} elbo_finite={elbo_finite} '
      f'eval_identical={eval_same} eval_finite={eval_finite} '
      f'resume_matches_uninterrupted={resume_match} '
      f'fit_params_identical={fit_same} fit_eval_identical={fit_eval_same} '
      f'stream_eq_device={stream_eq_dev} stream_identical={stream_same}',
      flush=True)
