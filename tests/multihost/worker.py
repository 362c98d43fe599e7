"""Two-process DP worker for tests/test_multihost.py.

Run as: python worker.py <process_id> <port> <workdir>  (x2, concurrently),
with JAX_PLATFORMS=cpu and PALLAS_AXON_POOL_IPS cleared in the SHELL env
(the axon sitecustomize imports jax before main(), so in-process env
mutation is too late). Forms a 2-process global mesh (1 CPU device each)
and validates the FULL pod story (VERDICT r2 #1):
  1. one shard_map train chunk with cross-process psum — params/metrics
     bit-identical on both processes;
  2. sharded-dataset DP (each process contributes only its process_shard);
  3. Trainer.evaluate over the global mesh — identical metrics both sides;
  4. a short fit() WITH eval cadence + checkpointing, then a resumed fit()
     — cross-process checkpoint save -> broadcast -> restore -> continue,
     with the resumed trajectory matching process-identically.
"""
import os, sys
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
os.environ['JAX_PLATFORMS'] = 'cpu'
pid = int(sys.argv[1])
workdir = sys.argv[3]
import jax
jax.distributed.initialize(coordinator_address='localhost:' + sys.argv[2],
                           num_processes=2, process_id=pid)
import jax.numpy as jnp, numpy as np
from jax.experimental import multihost_utils
from gmvae_tpu import configs, training as train_lib
from gmvae_tpu import data as data_lib
from gmvae_tpu.parallel import mesh as mesh_lib
from gmvae_tpu.models.gmvae import init_params
from jax.sharding import PartitionSpec as P

print(f'[p{pid}] global_devices={jax.device_count()} local={jax.local_device_count()} procs={jax.process_count()}', flush=True)
cfg = configs.synthetic_tiny(batch_size=32, fused=False)
ds = data_lib.make_synthetic(image_shape=cfg.image_shape, n_train=128, seed=0)
mesh = mesh_lib.make_mesh()
model = train_lib.make_model(cfg)
tx = train_lib.make_optimizer(cfg)
params = init_params(model, jax.random.PRNGKey(0))
state = train_lib.TrainState(params, tx.init(params), jnp.int32(0))
state = jax.device_put(state, mesh_lib.replicated(mesh))
x_all = mesh_lib.put_global(mesh, P(), ds.train_x)
idx = mesh_lib.put_global(mesh, P(None, mesh_lib.DATA_AXIS),
                          np.arange(2*32, dtype=np.int32).reshape(2, 32) % 128)
chunk = train_lib.make_train_chunk(model, cfg, mesh, tx)
state, metrics = chunk(state, x_all, idx, jax.random.PRNGKey(1))
# gather a param leaf from both processes and check bit-identical
leaf = jax.tree.leaves(state.params)[0]
local = np.asarray(leaf.addressable_shards[0].data)
gathered = multihost_utils.process_allgather(local)   # host-side gather
same = bool(np.array_equal(gathered[0], gathered[1]))
elbo_local = np.asarray(metrics['elbo'].addressable_shards[0].data)
elbo_g = multihost_utils.process_allgather(elbo_local)
same_elbo = bool(np.allclose(elbo_g[0], elbo_g[1]))

# sharded-dataset path: each process contributes ONLY its process_shard rows
# (put_sharded -> make_array_from_process_local_data), per-shard local plans
cfg_sh = cfg.replace(data_sharding='sharded')
tr = train_lib.Trainer(cfg_sh, ds)
# each DEVICE holds 1/n_dp of the dataset (n_dp = global device count)
assert (tr.x_all.addressable_shards[0].data.shape[0]
        == 128 // jax.device_count()), tr.x_all
st = tr.init_state()
st, m_sh = tr.run_chunk(st, tr.batch_plan(2))
leaf_sh = jax.tree.leaves(st.params)[0]
g_sh = multihost_utils.process_allgather(
    np.asarray(leaf_sh.addressable_shards[0].data))
same_sh = bool(np.array_equal(g_sh[0], g_sh[1]))
elbo_sh = np.asarray(m_sh['elbo'].addressable_shards[0].data)
finite_sh = bool(np.isfinite(elbo_sh).all())

# --- host_stream placement across processes: per-chunk batches staged as
# GLOBAL arrays sharded over 'data' (put_global) from identical host plans;
# must reproduce the replicated device-placement chunk bit-for-bit --------
cfg_st = cfg.replace(name='mh_stream', data_placement='host_stream')
tr_st = train_lib.Trainer(cfg_st, ds)
st_st = tr_st.init_state()
st_st, m_st = tr_st.run_chunk(st_st,
                              tr_st.stage_batches(tr_st.batch_plan_host(2)))
tr_dev = train_lib.Trainer(cfg.replace(name='mh_dev'), ds)
st_dev = tr_dev.init_state()
st_dev, _ = tr_dev.run_chunk(st_dev, tr_dev.batch_plan(2))
l_st = np.asarray(jax.tree.leaves(st_st.params)[0].addressable_shards[0].data)
l_dev = np.asarray(
    jax.tree.leaves(st_dev.params)[0].addressable_shards[0].data)
stream_eq_dev = bool(np.array_equal(l_st, l_dev))
g_st = multihost_utils.process_allgather(l_st)
stream_same = bool(np.array_equal(g_st[0], g_st[1]))

# --- Trainer.evaluate over the global mesh (VERDICT r2 missing #1: eval
# used to feed host-local arrays and would crash any multi-process mesh) ---
ev = tr.evaluate(st, max_examples=96)
ev_g = multihost_utils.process_allgather(
    np.array([ev['elbo_nats'], ev['iwae_nats'], ev['acc'], ev['nmi']]))
eval_same = bool(np.allclose(ev_g[0], ev_g[1]))
eval_finite = bool(np.isfinite(ev_g).all())

# --- full fit() with eval cadence + checkpoint, then resume ---------------
cfg_fit = cfg.replace(name='mh_fit', steps=6, scan_steps=2, eval_every=2,
                      ckpt_every=4, run_dir=os.path.join(workdir, 'runs'))
_, st_a, hist_a = train_lib.fit(cfg_fit, ds)          # 6 steps straight
assert [h['step'] for h in hist_a] == [2, 4, 6], hist_a
# second run directory: train 4 steps (writes ckpt_4), then resume to 6
cfg_fit_b = cfg_fit.replace(name='mh_fit_b')
_, st_b4, _ = train_lib.fit(cfg_fit_b.replace(steps=4), ds)
_, st_b, hist_b = train_lib.fit(cfg_fit_b, ds, resume=True)
assert int(st_b.step) == 6, int(st_b.step)
# resumed-from-checkpoint params == uninterrupted params (bit-stable), and
# identical across processes
la = np.asarray(jax.tree.leaves(st_a.params)[0].addressable_shards[0].data)
lb = np.asarray(jax.tree.leaves(st_b.params)[0].addressable_shards[0].data)
resume_match = bool(np.array_equal(la, lb))
g_fit = multihost_utils.process_allgather(lb)
fit_same = bool(np.array_equal(g_fit[0], g_fit[1]))
# final eval row of the resumed run agrees across processes
last = np.array([hist_b[-1]['elbo_nats'], hist_b[-1]['acc']])
g_last = multihost_utils.process_allgather(last)
fit_eval_same = bool(np.allclose(g_last[0], g_last[1]))

print(f'[p{pid}] RESULT params_identical={same} elbo_identical={same_elbo} '
      f'elbo_last={float(elbo_g[0][-1]):.4f} '
      f'stream_eq_device={stream_eq_dev} stream_identical={stream_same} '
      f'sharded_params_identical={same_sh} sharded_finite={finite_sh} '
      f'eval_identical={eval_same} eval_finite={eval_finite} '
      f'resume_matches_uninterrupted={resume_match} '
      f'fit_params_identical={fit_same} fit_eval_identical={fit_eval_same}',
      flush=True)
