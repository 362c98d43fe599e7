"""Device mesh + sharding helpers: the framework's entire comm backend.

TPU-native stance (SURVEY.md §2.2, §5.8): the equivalent of the NCCL/MPI
layer a GPU framework would hand-roll is XLA's collective lowering — our job
is a mesh and sharding annotations. DP is the one required strategy (per-chip
batch shard, ``psum`` grad all-reduce over ICI); the mesh is kept 2-D-capable
(``('data', 'model')``) so tensor parallelism is additive later, with the
model axis sized 1 for every BASELINE config.

Multi-host pod slices (v5e-16 = 4 hosts x 4 chips, BASELINE.json:11):
``init_distributed()`` calls ``jax.distributed.initialize()`` when a pod
environment is detected; data loading shards by ``jax.process_index()``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def init_distributed() -> None:
    """Initialize the multi-host runtime when running on a pod slice.

    No-op on single-host (the common case here). Gated on the coordinator
    env var so single-chip/CI runs never touch the distributed stack.

    Ordering is load-bearing: ``jax.distributed.initialize`` must run
    BEFORE anything initializes the XLA backend, and ``jax.process_count()``
    itself initializes the backend — so the already-initialized check must
    read the distributed-state global, never a device/process query (the
    previous ``process_count() == 1`` guard made this function raise on
    every real pod launch).
    """
    if not os.environ.get('JAX_COORDINATOR_ADDRESS'):
        return
    try:
        # private API — guarded so a jax upgrade that moves it degrades to
        # the initialize()+already-initialized fallback below instead of
        # raising on every pod launch (Trainer.__init__ calls this
        # unconditionally when JAX_COORDINATOR_ADDRESS is set)
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, 'client', None) is not None:
            return  # launcher (or a test harness) already initialized
    except (ImportError, AttributeError):
        pass
    # on real TPU pods initialize() auto-detects process count/id from
    # the TPU cluster metadata; generic launchers (and the 2-process CPU
    # test) have no detector, so accept the pair explicitly
    num = os.environ.get('GMVAE_NUM_PROCESSES')
    pid = os.environ.get('GMVAE_PROCESS_ID')
    try:
        jax.distributed.initialize(
            num_processes=int(num) if num else None,
            process_id=int(pid) if pid else None)
    except RuntimeError as e:
        if 'already initialized' not in str(e).lower():
            raise


def make_mesh(dp_devices: int = -1, model_devices: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """1-D data mesh (optionally 2-D with a model axis for future TP).

    ``dp_devices=-1`` uses every visible device. Device order follows
    ``jax.devices()``, which on TPU enumerates chips in ICI-neighbor order —
    the ``psum`` ring rides ICI, not DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp_devices in (-1, 0):
        dp_devices = len(devices) // model_devices
    n = dp_devices * model_devices
    if n > len(devices):
        raise ValueError(
            f'mesh wants {n} devices, only {len(devices)} visible')
    arr = np.array(devices[:n]).reshape(dp_devices, model_devices)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch shard over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec() -> P:
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


def shard_batch(mesh: Mesh, tree):
    """Place a host batch onto the mesh, sharded on the leading axis."""
    return jax.device_put(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


def put_global(mesh: Mesh, spec: P, host_array) -> jax.Array:
    """Build a global jax.Array from an identical host array on every process.

    Single-host this is just device_put; multi-host (v5e-16 pod slice,
    SURVEY.md §5.8) it assembles the global array from each process's
    addressable shards — every process must hold the same full host array
    (our datasets and batch plans are deterministic from the config seed, so
    they are identical by construction).

    Single-process inputs that are ALREADY device arrays (the batch plans
    ``Trainer.batch_plan`` computes on device) are resharded device-side:
    forcing them through ``np.asarray`` is a SYNCHRONOUS device->host fetch
    that the axon tunnel turns into a multi-hundred-ms stall per plan
    window — measured as a 44% steady-state gap between the reused-plan
    bench and the real ``fit()`` pipeline at the 20k-step scale before this
    fast path existed (PERF.md "Bench-vs-fit reconciliation", round 5).
    Values are unchanged either way; only the transfer route differs, so
    trajectories stay bit-identical (re-proven: the 20k mnist_k10 ELBO
    -225.94287109375 reproduced through this change).
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        if not isinstance(host_array, jax.Array):
            host_array = np.asarray(host_array)
        return jax.device_put(host_array, sharding)
    host_array = np.asarray(host_array)
    return jax.make_array_from_callback(
        host_array.shape, sharding, lambda idx: host_array[idx])


def process_shard(n: int) -> slice:
    """This host's contiguous shard of ``n`` examples for multi-host input
    pipelines (SURVEY.md §5.8): process ``i`` of ``p`` owns ``[i*n//p, (i+1)*n//p)``.

    Used by ``put_sharded`` — with ``data_sharding='sharded'`` each process
    materializes (or reads) only its own rows of the training set.
    """
    i, p = jax.process_index(), jax.process_count()
    return slice(i * n // p, (i + 1) * n // p)


def put_sharded(mesh: Mesh, host_array) -> jax.Array:
    """Build a global array sharded over the data axis (leading dim).

    ``host_array`` is the GLOBAL array, identical on every process (our
    datasets are deterministic from the config seed). Single-host this is a
    sharded device_put; multi-host each process contributes only its
    ``process_shard`` rows, so per-host HBM AND the assembly cost scale
    1/process_count. The leading dim must divide by the data-axis size
    (Trainer pads with wraparound).
    """
    host_array = np.asarray(host_array)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(host_array, sharding)
    local = host_array[process_shard(host_array.shape[0])]
    return jax.make_array_from_process_local_data(sharding, local,
                                                  host_array.shape)
