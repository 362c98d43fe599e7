"""Two-process DP worker for tests/test_multihost.py.

Run as: python worker.py <process_id> <port>  (x2, concurrently), with
JAX_PLATFORMS=cpu and PALLAS_AXON_POOL_IPS cleared in the SHELL env (the
axon sitecustomize imports jax before main(), so in-process env mutation is
too late). Forms a 2-process global mesh (1 CPU device each), runs one
shard_map train chunk with cross-process psum, and asserts params/metrics
are identical on both processes.
"""
import os, sys
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
os.environ['JAX_PLATFORMS'] = 'cpu'
pid = int(sys.argv[1])
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
assert tr.x_all.addressable_shards[0].data.shape[0] == 128 // 2, tr.x_all
st = tr.init_state()
st, m_sh = tr.run_chunk(st, tr.batch_plan(2))
leaf_sh = jax.tree.leaves(st.params)[0]
g_sh = multihost_utils.process_allgather(
    np.asarray(leaf_sh.addressable_shards[0].data))
same_sh = bool(np.array_equal(g_sh[0], g_sh[1]))
elbo_sh = np.asarray(m_sh['elbo'].addressable_shards[0].data)
finite_sh = bool(np.isfinite(elbo_sh).all())

print(f'[p{pid}] RESULT params_identical={same} elbo_identical={same_elbo} '
      f'elbo_last={float(elbo_g[0][-1]):.4f} '
      f'sharded_params_identical={same_sh} sharded_finite={finite_sh}',
      flush=True)
