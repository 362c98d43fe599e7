"""Training runtime: one XLA program per step, DP over a device mesh.

TPU-native redesign of the reference's host-driven epoch loop (SURVEY.md
§3.1): the reference crossed the host<->device boundary every step to feed a
batch; here the whole dataset lives in HBM as uint8, batch selection is an
on-device gather over a precomputed permutation plan, preprocessing (dynamic
binarization + normalization) is fused into the step, and ``scan_steps``
micro-steps run inside one jitted ``lax.scan`` so dispatch overhead
amortizes (SURVEY.md §7.3 hard part #4).

Parallelism: ``shard_map`` over a 1-D ``('data',)`` mesh; each shard computes
grads on its batch slice and ``psum``s them over ICI — the one communication
point in the hot loop (SURVEY.md §3.1). A 1-device mesh uses the identical
code path, so single-chip and pod-slice runs differ only in mesh shape.

Determinism: every random draw derives from ``fold_in(seed_key, step)`` (+
shard index), so a step is a pure function of ``(params, seed, step)`` —
failure recovery is restart-from-checkpoint (SURVEY.md §5.3).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gmvae_tpu import data as data_lib
from gmvae_tpu.configs import Config
from gmvae_tpu.models.gmvae import GMVAE, init_params
from gmvae_tpu.ops import dists
from gmvae_tpu.ops.elbo import mixture_elbo_head
from gmvae_tpu.parallel import mesh as mesh_lib
from gmvae_tpu.utils import checkpoint as ckpt_lib
from gmvae_tpu.utils import metrics as metrics_lib
from gmvae_tpu.utils.logging import RunLogger, save_image_grid

DATA = mesh_lib.DATA_AXIS


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def make_model(cfg: Config):
    """Build the configured model variant (SURVEY.md §1.1 model family).

    'gmvae' (incl. the K=1 plain VAE) takes the fused Pallas head when
    enabled+supported; the 'deep' hierarchical variant has no Gumbel-softmax
    head to fuse (closed-form responsibilities) and ignores ``cfg.fused``.
    """
    if cfg.model_family == 'deep':
        from gmvae_tpu.models.deep import DeepGMVAE
        return DeepGMVAE(cfg)
    if cfg.model_family != 'gmvae':
        raise ValueError(f'model_family must be gmvae|deep, '
                         f'got {cfg.model_family!r}')
    if cfg.fused_noise not in ('auto', 'threefry', 'xla'):
        raise ValueError(f'fused_noise must be auto|threefry|xla, '
                         f'got {cfg.fused_noise!r}')
    head_fn = mixture_elbo_head
    if cfg.fused:
        from gmvae_tpu.ops.kernels import fused_elbo
        if fused_elbo.is_supported():
            head_fn = (fused_elbo.fused_mixture_elbo
                       if cfg.fused_noise == 'auto' else functools.partial(
                           fused_elbo.fused_mixture_elbo,
                           noise_mode=cfg.fused_noise))
    return GMVAE(cfg, head_fn=head_fn)


def clip_by_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """Per-leaf (block-wise) gradient-norm clipping.

    Each parameter tensor is scaled to norm <= max_norm independently —
    no cross-leaf scalar reduction. Used by celeba_dp16: the global-norm
    formulation (one sqrt over every leaf's sumsq) crashes this
    environment's remote TPU compile helper at celeba scale (PERF.md
    "Environment quirks"; measured: bare adam and per-leaf clip compile,
    both global-norm formulations 500), and block-wise clipping is an
    established alternative with the same divergence protection.
    """
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def clip(g):
            n = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-12))

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init, update)


_CLIPS = {'global': optax.clip_by_global_norm, 'per_leaf': clip_by_leaf_norm,
          'value': optax.clip}


class AdamLowmemState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def scale_by_adam_lowmem(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8,
                         state_dtype=jnp.bfloat16
                         ) -> optax.GradientTransformation:
    """Adam moment tracking with the moments STORED in ``state_dtype``.

    All arithmetic stays float32 — each step upcasts m/v, blends them with
    the f32 gradient, bias-corrects, and downcasts for storage — so the
    only difference vs ``optax.adam`` is storage rounding of the two moment
    trees (a float32-storage instantiation is asserted EXACTLY equal to
    optax.adam: tests/test_train.py). That halves the optimizer's HBM
    working set — for the MLP configs Adam's param+moment traffic is the
    dominant per-step HBM term (PERF.md roofline: ~27 MB/step at
    mnist_k10, ~half of it m+v reads/writes). Selected per named config
    via ``Config.opt_state_dtype``: DEFAULT for mnist_k10 (and derived),
    fmnist_deep, mnist_deepmix, cifar_k20 after a measured sweep (+8.8%
    to +21.8% throughput at 0.005-0.13% trained-ELBO parity — PERF.md
    "bf16 optimizer state"); svhn_conv and celeba_dp16 measured and kept
    float32 (no gain / parity unprovable at K=64 basin sensitivity).
    """
    def init(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), dtype=state_dtype)
        return AdamLowmemState(jnp.zeros((), jnp.int32),
                               jax.tree.map(zeros, params),
                               jax.tree.map(zeros, params))

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        f32 = lambda a: a.astype(jnp.float32)
        mu32 = jax.tree.map(lambda m, g: b1 * f32(m) + (1 - b1) * f32(g),
                            state.mu, updates)
        nu32 = jax.tree.map(
            lambda v, g: b2 * f32(v) + (1 - b2) * jnp.square(f32(g)),
            state.nu, updates)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu32, nu32)
        down = lambda t: jax.tree.map(lambda a: a.astype(state_dtype), t)
        return out, AdamLowmemState(count, down(mu32), down(nu32))

    return optax.GradientTransformation(init, update)


def _adam(cfg: Config) -> optax.GradientTransformation:
    if cfg.opt_state_dtype == 'float32':
        return optax.adam(cfg.lr)
    if cfg.opt_state_dtype != 'bfloat16':
        raise ValueError(f'opt_state_dtype must be float32|bfloat16, '
                         f'got {cfg.opt_state_dtype!r}')
    return optax.chain(scale_by_adam_lowmem(state_dtype=jnp.bfloat16),
                       optax.scale(-cfg.lr))


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.grad_clip > 0:
        # conv/ResNet Gaussian-likelihood configs diverge without this on
        # long runs (measured: cifar_k20 ELBO +3815 at 8k steps -> -1820 at
        # 30k); MLP/Bernoulli configs are stable bare.
        if cfg.grad_clip_impl not in _CLIPS:
            raise ValueError(f'grad_clip_impl must be one of {sorted(_CLIPS)}'
                             f', got {cfg.grad_clip_impl!r}')
        return optax.chain(_CLIPS[cfg.grad_clip_impl](cfg.grad_clip),
                           _adam(cfg))
    return _adam(cfg)


def schedules(cfg: Config, step: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(tau, beta) at a step: Gumbel temperature anneal + KL warmup."""
    tau = dists.temperature_schedule(step, cfg.tau0, cfg.tau_min,
                                     cfg.tau_anneal)
    if cfg.kl_warmup_steps > 0:
        beta = jnp.minimum(1.0, (step.astype(jnp.float32) + 1.0)
                           / cfg.kl_warmup_steps)
    else:
        beta = jnp.float32(1.0)
    return tau, beta


def make_loss_fn(model: GMVAE, cfg: Config):
    def loss_fn(params, x, key, step):
        tau, beta = schedules(cfg, step)
        elbo, aux = model.apply({'params': params}, x, key, tau)
        log_px_z = aux['log_px_z']
        kl_total = log_px_z - elbo  # whatever the elbo_form charges
        # loss anneals the KL weight; the REPORTED elbo never does
        loss = -jnp.mean(log_px_z - beta * kl_total)
        if cfg.balance_weight > 0:
            # cluster-balance regularizer: KL(mean_batch q(k|x) || uniform)
            qbar = jnp.mean(jax.nn.softmax(aux['k_logits'], axis=-1), axis=0)
            k = qbar.shape[-1]
            balance = jnp.sum(qbar * jnp.log(qbar * k + 1e-12))
            loss = loss + cfg.balance_weight * balance
        if cfg.conf_weight > 0:
            # assignment-confidence regularizer: E_x[H(q(k|x))]; with the
            # balance term this is -I(k;x) (configs.Config.conf_weight)
            logq = jax.nn.log_softmax(aux['k_logits'], axis=-1)
            ent = -jnp.sum(jnp.exp(logq) * logq, axis=-1)
            loss = loss + cfg.conf_weight * jnp.mean(ent)
        metrics = {
            'loss': loss,
            'elbo': jnp.mean(elbo),
            'log_px_z': jnp.mean(log_px_z),
            'kl': jnp.mean(kl_total),
            'kl_cat': jnp.mean(aux['kl_cat']),
            'tau': tau,
            'beta': beta,
        }
        assert set(metrics) == set(METRIC_KEYS)
        return loss, metrics
    return loss_fn


# the per-step metrics structure (all f32 scalars). Single-sourced here so
# mean-mode chunk accumulators (_scan_with_metrics) can be built without
# abstractly evaluating a step; make_loss_fn asserts against it.
METRIC_KEYS = ('loss', 'elbo', 'log_px_z', 'kl', 'kl_cat', 'tau', 'beta')


def make_train_step(model: GMVAE, cfg: Config,
                    tx: optax.GradientTransformation):
    """Per-shard step body. Must run inside shard_map over the data axis."""
    loss_fn = make_loss_fn(model, cfg)

    def train_step(state: TrainState, batch_u8: jax.Array,
                   base_key: jax.Array):
        # NOTE: the metrics dict this returns must keep exactly the
        # METRIC_KEYS structure — mean-mode chunks (_scan_with_metrics)
        # initialize their accumulator from that constant.
        shard = jax.lax.axis_index(DATA)
        key = jax.random.fold_in(jax.random.fold_in(base_key, state.step),
                                 shard)
        k_pre, k_elbo = jax.random.split(key)
        x = data_lib.preprocess_batch(k_pre, batch_u8, cfg.binarize)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, k_elbo, state.step)
        # the one collective in the hot loop: gradient all-reduce over ICI
        grads = jax.lax.pmean(grads, DATA)
        metrics = jax.lax.pmean(metrics, DATA)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def _scan_with_metrics(cfg: Config, body, state, xs):
    """``lax.scan`` of a ``(state, x) -> (state, metrics)`` body, with the
    chunk's metrics either stacked per step or reduced to a running mean.

    ``cfg.metrics_mode``:
      'stacked' — metrics come back as [S] arrays (one row per micro-step):
        the trajectory contract goldens and parity protocols read.
      'mean'    — metrics are summed into a scalar carry and returned as
        their chunk mean, shaped [1] (so ``m['elbo'][-1]``-style fences and
        consumers work unchanged). This removes the per-step
        dynamic-update-slice stacking of seven [S] output buffers — profile
        attribution measured that stacking at 4.6 us/step = 8% of the
        flagship's 57.4 us step (PERF.md r4 per-op table). The params math
        is untouched: the accumulator only adds AFTER step_fn returns, so
        trained trajectories are bit-identical across modes
        (tests/test_train.py::test_metrics_mode_mean_params_bit_equal).

    ``cfg.scan_unroll`` is passed straight to ``lax.scan`` (>=1).
    """
    if cfg.metrics_mode == 'stacked':
        return jax.lax.scan(body, state, xs, unroll=cfg.scan_unroll)

    def body_acc(carry, x):
        st, acc = carry
        st, m = body(st, x)
        return (st, jax.tree.map(jnp.add, acc, m)), None

    acc0 = {k: jnp.zeros((), jnp.float32) for k in METRIC_KEYS}
    (state, acc), _ = jax.lax.scan(body_acc, (state, acc0), xs,
                                   unroll=cfg.scan_unroll)
    n = jnp.float32(xs.shape[0])
    return state, jax.tree.map(lambda a: (a / n)[None], acc)


def _validate_chunk_cfg(cfg: Config) -> None:
    if cfg.metrics_mode not in ('stacked', 'mean'):
        raise ValueError(f'metrics_mode must be stacked|mean, '
                         f'got {cfg.metrics_mode!r}')
    if cfg.scan_unroll < 1:
        raise ValueError(f'scan_unroll must be >= 1, got {cfg.scan_unroll}')


def make_train_chunk(model: GMVAE, cfg: Config, mesh,
                     tx: optax.GradientTransformation,
                     check_vma: bool = True):
    """jit(shard_map(scan of train steps)): the compiled hot loop.

    Args of the returned fn:
      state:    replicated TrainState
      x_all:    device-resident uint8 dataset — image rows [N, H, W, C] or
                flat rows [N, P] (either layout; the body reshapes after
                the gather, an identity for image-shaped sources)
      idx:      [S, B_global] int32 batch plan, sharded over the batch axis
      base_key: replicated PRNG key
    Returns (state, metrics dict of [S] arrays).

    Why flat rows are the layout Trainer stages for the MLP families
    (conv archs keep image staging — their gather is ~2% of the step and
    the post-gather relayout feeding the convs measured svhn −5.5%,
    PERF.md r4): XLA tiles an image-shaped
    u8[N,28,28,1] source T(8,128)(4,1), padding every 784-byte example to
    a ~4 KB strided tile footprint that the per-step batch gather pays per
    row — profile attribution measured that ONE gather fusion at
    33.9 us/step = 36% of the flagship's 93.7 us while-envelope, the
    step's single largest op (tools/profile_attr.py, PERF.md r4). Flat
    lane-major rows gather ~26% faster (tools/bench_gather.py, checksum-
    proved identical bytes); the post-gather reshape restores the exact
    bytes the preprocess saw before, so trajectories are bit-identical by
    construction (tests/test_dp.py::test_flat_dataset_layout_bit_equal) —
    and for the MLP families the model's own flatten cancels the reshape.

    ``check_vma`` (shard_map's static replication checker) is ON by
    default: the Pallas head declares its outputs' varying-across-mesh
    sets via ``vma=`` on its out_shapes (fused_elbo.vma_union), so the
    checker verifies psum placement on both fused and unfused paths.
    Interpret-mode Pallas (CPU tests only) lowers block indexing through
    dynamic_slice ops the checker rejects — those tests pass
    ``check_vma=False`` explicitly.
    """
    _validate_chunk_cfg(cfg)
    step_fn = make_train_step(model, cfg, tx)

    def chunk(state, x_all, idx, base_key):
        def body(st, idx_row):
            rows = x_all[idx_row]
            batch = rows.reshape(rows.shape[0], *cfg.image_shape)
            return step_fn(st, batch, base_key)
        return _scan_with_metrics(cfg, body, state, idx)

    # 'sharded': each shard_map block sees only its dataset partition and
    # its idx columns carry LOCAL row numbers (Trainer.batch_plan builds
    # per-shard plans); 'replicated' gathers global indices from a full copy
    data_spec = P(DATA) if cfg.data_sharding == 'sharded' else P()
    sharded = jax.shard_map(
        chunk, mesh=mesh,
        in_specs=(P(), data_spec, P(None, DATA), P()),
        out_specs=(P(), P()), check_vma=check_vma)
    return jax.jit(sharded, donate_argnums=(0,))


def make_train_chunk_stream(model: GMVAE, cfg: Config, mesh,
                            tx: optax.GradientTransformation,
                            check_vma: bool = True):
    """Streaming variant of ``make_train_chunk``: batches arrive staged.

    Args of the returned fn:
      state:    replicated TrainState
      batches:  [S, B_global, H, W, C] uint8 batch stack, sharded over the
                batch axis — gathered on HOST from the same index plan
                ``make_train_chunk`` would read on device
      base_key: replicated PRNG key

    The scan body consumes ``batches[s]`` directly instead of gathering
    from a device-resident dataset, so the dataset never needs to fit in
    HBM; each shard block sees its own [S, B_local, ...] slice and the
    per-step math (preprocess -> grad -> psum -> update) is byte-for-byte
    the same step_fn — trajectories match 'device' placement bit-exactly
    (tests/test_stream.py).
    """
    _validate_chunk_cfg(cfg)
    step_fn = make_train_step(model, cfg, tx)

    def chunk(state, batches, base_key):
        def body(st, batch_u8):
            return step_fn(st, batch_u8, base_key)
        return _scan_with_metrics(cfg, body, state, batches)

    sharded = jax.shard_map(
        chunk, mesh=mesh,
        in_specs=(P(), P(None, DATA), P()),
        out_specs=(P(), P()), check_vma=check_vma)
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(model: GMVAE, cfg: Config, mesh):
    """Global-jit eval batch: per-sample ELBO + cluster assignment.

    Uses XLA's sharding propagation (batch sharded over 'data', params
    replicated) instead of shard_map — eval has no collectives to place
    beyond the output all-gather. Outputs are REPLICATED so every process
    of a multi-host mesh holds the full per-sample arrays: the host-side
    metric reduction (Hungarian ACC, NMI, means) then computes identically
    on every process with no cross-process gather of its own.
    """
    def eval_step(params, batch_u8, key, step):
        k_pre, k_elbo = jax.random.split(key)
        x = data_lib.preprocess_batch(k_pre, batch_u8, cfg.binarize)
        tau, _ = schedules(cfg, step)

        def one(k):
            elbo, aux = model.apply({'params': params}, x, k, tau)
            return elbo, aux['k_logits']

        # multi-sample eval: mean of S single-sample ELBOs (the trained
        # objective, variance-reduced) + IWAE-style LSE bound (SURVEY.md
        # §3.2 "optionally IWAE-style multi-sample LSE estimate")
        s = max(1, cfg.eval_samples)
        elbos, k_logits = jax.vmap(one)(jax.random.split(k_elbo, s))
        elbo = jnp.mean(elbos, axis=0)                              # [B]
        iwae = jax.scipy.special.logsumexp(elbos, axis=0) - jnp.log(
            jnp.float32(s))                                         # [B]
        yhat = jnp.argmax(k_logits[0], axis=-1)  # encoder is deterministic
        return elbo, iwae, yhat

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(DATA))
    return jax.jit(eval_step,
                   in_shardings=(repl, bsh, repl, repl),
                   out_shardings=(repl, repl, repl))


def pad_to_multiple(x: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        # tile x as many times as the padding needs — a single x[:rem]
        # slice falls short whenever multiple > 2n (e.g. a 10-example
        # eval set padded to a 64-example batch)
        reps = -(-rem // n)
        pad = np.concatenate([x] * reps, axis=0)[:rem]
        x = np.concatenate([x, pad], axis=0)
    return x, n


# eval staging budget: uint8 bytes resident per super-stage. 256 MB covers
# every BASELINE test set in ONE stage (celeba's 19962x64x64x3 = 245 MB is
# the largest) while staying ~1.5% of a v5e chip's HBM.
_EVAL_STAGE_BYTES = 256 * 1024 * 1024


def evaluate(eval_step, cfg: Config, mesh, params, test_x: np.ndarray,
             test_y: Optional[np.ndarray], step: int,
             seed: int = 17, batch_size: Optional[int] = None) -> Dict[str, float]:
    """Full test-set eval: ELBO (nats), clustering ACC/NMI (SURVEY.md §3.2/3.4).

    Multi-host-safe: every process holds the identical ``test_x`` (datasets
    are deterministic from the config seed, or the same real files), each
    super-stage is assembled into a GLOBAL array sharded over the data axis
    (``put_global``), batches are device-side slices of it (a global SPMD
    op every process dispatches in lockstep), and the jitted step returns
    replicated outputs — so
    this runs unmodified on a one-chip mesh or a v5e-16 pod slice, with
    every process computing identical metrics (asserted by
    tests/multihost/worker.py).
    """
    bs = batch_size or cfg.batch_size
    xs, n = pad_to_multiple(np.asarray(test_x), bs)
    key = jax.random.PRNGKey(seed)
    step_arr = jnp.int32(step)
    # Stage the sweep instead of round-tripping per batch: the old
    # per-batch put_global + three np.asarray fetches cost one sequential
    # put->dispatch->fetch cycle PER BATCH — on the remote-TPU tunnel a
    # 10k-example eval was ~79 serial round-trips, dominating wall-clock
    # for every long run (VERDICT r3 #5). Now the padded set goes up in
    # byte-bounded super-stages (one async put_global each, the
    # stage_batches pattern), each batch is a device-side slice of the
    # stage, every eval_step dispatch is async, and the three outputs are
    # concatenated ON DEVICE and fetched once at the end. Trajectory-
    # invariant by construction: per-batch keys (fold_in(key, example
    # offset)), batch bytes, and the jitted eval_step are identical, and
    # concatenation is exact — goldens and the eval==train-row identity
    # do not move.
    stacked = xs.reshape(-1, bs, *xs.shape[1:])          # [C, bs, ...]
    per_stage = max(1, _EVAL_STAGE_BYTES // max(1, stacked[0].nbytes))
    elbos, iwaes, yhats = [], [], []
    for s0 in range(0, stacked.shape[0], per_stage):
        staged = mesh_lib.put_global(mesh, P(None, DATA),
                                     stacked[s0:s0 + per_stage])
        for c in range(staged.shape[0]):
            k = jax.random.fold_in(key, (s0 + c) * bs)
            e, iw, y = eval_step(params, staged[c], k, step_arr)
            elbos.append(e)
            iwaes.append(iw)
            yhats.append(y)
    elbo = np.asarray(jnp.concatenate(elbos))[:n]
    iwae = np.asarray(jnp.concatenate(iwaes))[:n]
    out = {'elbo_nats': float(elbo.mean()),
           'iwae_nats': float(iwae.mean())}
    if test_y is not None:
        yhat = np.asarray(jnp.concatenate(yhats))[:n]
        out['acc'] = metrics_lib.cluster_acc(test_y, yhat)
        out['nmi'] = metrics_lib.nmi(test_y, yhat)
    return out


class Trainer:
    """Owns mesh, jitted fns, and device-resident data for a config."""

    def __init__(self, cfg: Config, dataset: Optional[data_lib.Dataset] = None):
        mesh_lib.init_distributed()
        self.cfg = cfg
        self.mesh = mesh_lib.make_mesh(cfg.dp_devices)
        self.n_dp = self.mesh.shape[DATA]
        if cfg.batch_size % self.n_dp:
            raise ValueError(f'batch_size {cfg.batch_size} not divisible by '
                             f'data-parallel size {self.n_dp}')
        if cfg.data_sharding not in ('replicated', 'sharded'):
            raise ValueError(f'data_sharding must be replicated|sharded, '
                             f'got {cfg.data_sharding!r}')
        if cfg.data_placement not in ('device', 'host_stream'):
            raise ValueError(f'data_placement must be device|host_stream, '
                             f'got {cfg.data_placement!r}')
        if (cfg.data_placement == 'host_stream'
                and cfg.data_sharding != 'replicated'):
            # streaming already bounds HBM to the staging buffers; the
            # sharded-dataset layout solves the same problem a different
            # way and its per-shard plans don't apply to staged batches
            raise ValueError("data_placement='host_stream' requires "
                             "data_sharding='replicated'")
        self.dataset = dataset or data_lib.load(cfg.dataset,
                                                image_shape=cfg.image_shape)
        self.model = make_model(cfg)
        self.tx = make_optimizer(cfg)
        self.eval_step = make_eval_step(self.model, cfg, self.mesh)
        self.base_key = jax.random.PRNGKey(cfg.seed)
        self._plan_programs: Dict[int, Any] = {}  # window len -> jitted gen
        if cfg.data_placement == 'host_stream':
            # dataset stays in host RAM; chunks stage their batches via an
            # async host->device put (iter_chunk_plans), so HBM holds only
            # in-flight staging buffers — datasets >> HBM can train
            self.train_chunk = make_train_chunk_stream(self.model, cfg,
                                                       self.mesh, self.tx)
            self.train_x_host = np.ascontiguousarray(self.dataset.train_x)
            self.x_all = None
            self.n_local = int(self.train_x_host.shape[0])
            return
        self.train_chunk = make_train_chunk(self.model, cfg, self.mesh, self.tx)
        # device-resident training images (uint8: 4x smaller than f32 in
        # HBM). MLP-family configs stage FLAT [N, P] rows — the gather-
        # layout fast path (make_train_chunk docstring; the chunk body
        # restores image shape after the gather, bit-identically; measured
        # +34-65% across the MLP configs). Conv-family configs keep image-
        # shaped staging: their gather is ~2% of the step and the post-
        # gather relayout feeding the convs measured svhn −5% (cifar
        # unchanged) — PERF.md round-4 attribution. 'replicated': full
        # copy per device via put_global (multi-host-safe, SURVEY.md
        # §5.8). 'sharded': partitioned over the data axis — 1/n_dp HBM
        # per chip, each shard samples its own partition.
        xs_host = np.asarray(self.dataset.train_x)
        if cfg.arch == 'mlp':
            xs_host = xs_host.reshape(xs_host.shape[0], -1)
        if cfg.data_sharding == 'sharded':
            xs, _ = pad_to_multiple(xs_host, self.n_dp)
            self.x_all = mesh_lib.put_sharded(self.mesh, xs)
            self.n_local = xs.shape[0] // self.n_dp
        else:
            self.x_all = mesh_lib.put_global(self.mesh, P(), xs_host)
            self.n_local = int(self.x_all.shape[0])

    # -- state ----------------------------------------------------------
    def init_state(self) -> TrainState:
        params = init_params(self.model, jax.random.fold_in(self.base_key, 0))
        opt_state = self.tx.init(params)
        state = TrainState(params, opt_state, jnp.int32(0))
        return jax.device_put(state, mesh_lib.replicated(self.mesh))

    def state_to_tree(self, state: TrainState) -> Dict[str, Any]:
        return {'params': state.params, 'opt_state': state.opt_state,
                'step': state.step}

    def tree_to_state(self, tree: Dict[str, Any]) -> TrainState:
        # Checkpoint migration across opt_state_dtype changes: flax's
        # structural restore keeps the STORED array dtypes (the 'like' tree
        # is structure-only), so a pre-flip f32-moment snapshot restored
        # into a bf16-moment config would hand lax.scan a carry whose body
        # returns different dtypes -> TypeError mid-resume. Cast every
        # opt-state leaf to the dtype this config's optimizer initializes
        # (moment ROUNDING on a downcast is the same rounding one training
        # step later would apply anyway).
        ref = self.tx.init(tree['params'])
        opt_state = jax.tree.map(
            lambda r, x: jnp.asarray(x, getattr(r, 'dtype', None)),
            ref, tree['opt_state'])
        state = TrainState(tree['params'], opt_state,
                           jnp.int32(tree['step']))
        return jax.device_put(state, mesh_lib.replicated(self.mesh))

    # -- data plan ------------------------------------------------------
    def batch_plan(self, n_steps: int, start_step: int = 0) -> jax.Array:
        """[n_steps, B_global] device-resident batch indices, sharded for DP.

        Multi-host (SURVEY.md §5.8): the plan is a pure function of the
        config seed, computed by one jitted SPMD program whose
        ``out_shardings`` partition the batch axis over the global mesh —
        every process dispatches the identical program and each device
        keeps only its own batch columns.

        'replicated' data: one global permutation stream; indices are global
        rows. 'sharded' data: shard ``s`` gets an independent permutation
        stream over its LOCAL partition (fold_in(plan_key, s)); its column
        block carries local row numbers, matching its x_all block.
        """
        if self.cfg.data_placement == 'host_stream':
            raise RuntimeError('host_stream placement uses batch_plan_host '
                               '(plans must be host arrays to gather from '
                               'host RAM; a global device plan cannot be '
                               'fetched on a multi-process mesh)')
        return self._plan_program(n_steps)(jnp.int32(start_step))

    def _plan_program(self, n_steps: int):
        """The compiled plan generator for ``n_steps``-long windows.

        One executable serves EVERY window of a run: the window position
        is traced DATA (``epoch_keys`` makes the generation shape-stable
        in ``start_step``), and ``out_shardings`` places the plan directly
        into its DP layout — so window generation is one async jit
        dispatch, with no host round trip and no mid-run recompile. The
        eager form this replaces (generate on device -> sync np.asarray
        fetch -> put_global) measured a 44% steady-state gap between the
        reused-plan bench and the real fit() pipeline at 20k-step scale;
        with this program the fresh-process 20k reproduction runs within
        2.7% of the windowed driver bench and 4.3% of the plan-free
        step-isolation arm (PERF.md "Bench-vs-fit reconciliation",
        round 5).
        """
        fn = self._plan_programs.get(n_steps)
        if fn is not None:
            return fn
        plan_key = jax.random.fold_in(self.base_key, 1)
        if self.cfg.data_sharding == 'sharded':
            b_local = self.cfg.batch_size // self.n_dp
            n_dp = self.n_dp

            def gen(start):
                shard_keys = jax.vmap(
                    lambda s: jax.random.fold_in(plan_key, s))(
                        jnp.arange(n_dp))
                plans = jax.vmap(lambda k: data_lib.epoch_batch_indices(
                    k, self.n_local, b_local, n_steps, start))(shard_keys)
                # [n_dp, S, b_local] -> [S, n_dp*b_local], columns grouped
                # by shard (NamedSharding partitions the axis contiguously
                # in device order, so shard s receives exactly its block)
                return jnp.transpose(plans, (1, 0, 2)).reshape(n_steps, -1)
        else:
            def gen(start):
                return data_lib.epoch_batch_indices(
                    plan_key, self.n_local, self.cfg.batch_size, n_steps,
                    start)
        fn = jax.jit(gen, out_shardings=NamedSharding(self.mesh,
                                                      P(None, DATA)))
        self._plan_programs[n_steps] = fn
        return fn

    def batch_plan_host(self, n_steps: int, start_step: int = 0) -> np.ndarray:
        """The host-side batch plan for 'host_stream' placement.

        Same values as ``batch_plan``'s replicated stream (identical
        ``epoch_batch_indices`` derivation — that is what makes stream
        trajectories bit-equal to device placement), but returned as host
        numpy: streaming gathers rows from host RAM, and on a multi-
        process mesh a device-global plan could not even be fetched back
        (non-addressable shards). Every process computes the identical
        plan from the config seed — the multi-host invariant all our
        plans rely on (SURVEY.md §5.8).
        """
        plan_key = jax.random.fold_in(self.base_key, 1)
        idx = data_lib.epoch_batch_indices(plan_key, self.n_local,
                                           self.cfg.batch_size, n_steps,
                                           start_step)
        return np.asarray(idx)

    # -- loops ----------------------------------------------------------
    def run_chunk(self, state: TrainState, payload: jax.Array):
        """One compiled chunk. ``payload`` is what ``iter_chunk_plans``
        yielded: a device batch-index slice ('device' placement) or a
        staged uint8 batch stack ('host_stream')."""
        if self.x_all is None:
            return self.train_chunk(state, payload, self.base_key)
        return self.train_chunk(state, self.x_all, payload, self.base_key)

    def stage_batches(self, idx_host: np.ndarray) -> jax.Array:
        """Host-gather one chunk's batches and start their device transfer.

        ``idx_host``: [S, B_global] int32 rows into the host dataset.
        Returns a [S, B_global, ...] uint8 global array sharded over the
        batch axis. ``put_global`` is an ASYNC host->device put, and jit
        dispatch is async too — so by yielding the staged array before the
        previous chunk finishes, the DMA for chunk i+1 overlaps chunk i's
        compute with no threads (the TPU-native double-buffer).
        """
        rows = self.train_x_host[idx_host.reshape(-1)]
        batches = rows.reshape(*idx_host.shape, *self.train_x_host.shape[1:])
        return mesh_lib.put_global(self.mesh, P(None, DATA), batches)

    def iter_chunk_plans(self, start: int, total: int):
        """Yield per-chunk batch plans ``(n_steps, idx)`` for steps
        ``[start, total)``, generated in SUPER-chunks: bounded
        O(plan-window) device memory instead of an O(total-steps) resident
        array, while the per-chunk cost stays a device-side slice. Device
        placement generates each window with ONE async jit dispatch
        (``_plan_program``); host_stream still pays a sync device->host
        fetch per window (the host gather needs the values), which must
        not land in the hot loop every chunk (measured: per-chunk
        generation sank svhn steady-state 318k -> 21k img/s; a window
        amortizes it 8-156x). Multi-window runs always generate
        FULL windows (the last overshoots ``total``; the extra rows are
        never consumed and the permutation stream is prefix-stable, so
        trajectories are unchanged regardless of windowing) — a
        shape-changing final window would jit-compile a second
        plan-generation program mid-run (measured: a ~10 s stall that made
        mnist_vae's logged steady-state read 158k instead of ~1M img/s).
        The single source of the windowing rule for ``fit()`` AND the
        measurement harnesses (tools/reproduce_baselines.py).
        """
        chunk = max(1, self.cfg.scan_steps)
        # window sized to ~8 MB of int32 indices — but floored at several
        # chunks: at extreme batch sizes (2M // batch < chunk) the byte
        # budget alone would collapse window == chunk, regenerating the
        # plan (a host round-trip) EVERY chunk — exactly the stall this
        # windowing exists to avoid. 8 chunks of indices is still bounded
        # (8 * chunk * batch int32s, ≪ the batch data itself).
        window = max(chunk * 8,
                     (2_000_000 // self.cfg.batch_size) // chunk * chunk)
        multi_window = total - start > window
        stream = self.x_all is None
        plan_buf, plan_base = None, 0
        pos = start
        while pos < total:
            s = min(chunk, total - pos)
            if plan_buf is None or pos + s > plan_base + plan_buf.shape[0]:
                w = window if multi_window else total - pos
                plan_buf = (self.batch_plan_host(w, start_step=pos) if stream
                            else self.batch_plan(w, start_step=pos))
                plan_base = pos
            off = pos - plan_base
            sl = plan_buf[off:off + s]
            yield s, (self.stage_batches(sl) if stream else sl)
            pos += s

    def evaluate(self, state: TrainState, max_examples: Optional[int] = None
                 ) -> Dict[str, float]:
        xs, ys = self.dataset.test_x, self.dataset.test_y
        if max_examples:
            xs, ys = xs[:max_examples], ys[:max_examples]
        return evaluate(self.eval_step, self.cfg, self.mesh, state.params,
                        xs, ys, int(state.step))


def _parse_ckpt_step(path: str) -> int:
    """step N from a ``.../ckpt_N.msgpack`` path."""
    return int(os.path.basename(path).split('_')[1].split('.')[0])


def fit(cfg: Config, dataset: Optional[data_lib.Dataset] = None,
        resume: bool = False, logger: Optional[RunLogger] = None,
        save_grids: bool = False):
    """Train a config end-to-end. Returns (trainer, state, history).

    The reference's epoch loop becomes: precompute the batch plan, run
    ``scan_steps``-sized compiled chunks, eval + checkpoint on the cadence
    the config sets.
    """
    trainer = Trainer(cfg, dataset)
    run_dir = os.path.join(cfg.run_dir, cfg.name)
    proc0 = jax.process_index() == 0
    logger = logger or RunLogger(run_dir, echo=proc0, write=proc0)
    state = trainer.init_state()

    if resume:
        # multi-host: process 0 (the checkpoint writer) decides which step
        # to resume from and broadcasts it, so every process takes the same
        # branch even when filesystems are not shared consistently; each
        # process then reads the snapshot for that step from its own view
        # of run_dir (shared fs, or a copy the launcher distributed)
        path = ckpt_lib.latest_ckpt(run_dir) if proc0 else None
        step0 = _parse_ckpt_step(path) if path else -1
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            step0 = int(multihost_utils.broadcast_one_to_all(
                np.int32(step0)))
        if step0 >= 0:
            path = os.path.join(run_dir, f'ckpt_{step0}.msgpack')
            tree = ckpt_lib.restore_ckpt(path, trainer.state_to_tree(state))
            state = trainer.tree_to_state(tree)
            logger.log({'event': 'resume', 'from': path,
                        'step': int(state.step)})

    start = int(state.step)
    total = cfg.steps
    n_chips = jax.device_count()

    history = []
    t_last = time.perf_counter()
    imgs_since = 0
    step_now = start
    first_timing = True  # first window includes jit compile
    for s, idx in trainer.iter_chunk_plans(start, total):
        state, _ = trainer.run_chunk(state, idx)
        imgs_since += s * cfg.batch_size
        step_now += s

        # eval_every=0 disables the cadence (symmetric with ckpt_every=0)
        if cfg.eval_every and (step_now % cfg.eval_every < s
                               or step_now >= total):
            # device->host fetch as a real fence (block_until_ready does not
            # synchronize on the axon remote platform)
            int(jax.device_get(state.step))
            dt = time.perf_counter() - t_last
            # batch_size is GLOBAL, so per-chip divides by the GLOBAL
            # device count (SURVEY.md §5.5 specifies img_per_sec_per_chip)
            rate = imgs_since / max(dt, 1e-9)
            row = {'step': step_now,
                   'img_per_sec_per_chip': rate / n_chips,
                   'img_per_sec_global': rate}
            if first_timing:
                row['includes_compile'] = True  # don't quote this one
                first_timing = False
            row.update(trainer.evaluate(state))
            logger.log(row)
            history.append(row)
            if save_grids:
                _save_grids(trainer, state, run_dir, step_now)
            t_last = time.perf_counter()
            imgs_since = 0

        if cfg.ckpt_every and (step_now % cfg.ckpt_every < s
                               or step_now >= total):
            ckpt_lib.save_ckpt(
                os.path.join(run_dir, f'ckpt_{step_now}.msgpack'),
                trainer.state_to_tree(state))
            ckpt_lib.prune_ckpts(run_dir, keep=cfg.ckpt_keep)

    return trainer, state, history


def _save_grids(trainer: Trainer, state: TrainState, run_dir: str,
                step: int) -> None:
    """Sample + reconstruction PNG grids (reference's qualitative outputs).

    Multi-host: the jitted computations run on EVERY process (params are
    global arrays, so all controllers must participate in the program);
    only process 0 writes the PNGs.
    """
    cfg = trainer.cfg
    model = trainer.model
    repl = mesh_lib.replicated(trainer.mesh)

    @functools.partial(jax.jit)
    def gen(params, key):
        return model.apply({'params': params}, key, 64, method=model.sample)

    @functools.partial(jax.jit)
    def rec(params, x):
        return model.apply({'params': params}, x, method=model.reconstruct)

    key = jax.device_put(jax.random.fold_in(jax.random.PRNGKey(7), step),
                         repl)
    samples = np.asarray(gen(state.params, key))
    x_u8 = mesh_lib.put_global(trainer.mesh, P(),
                               trainer.dataset.test_x[:64])
    x = data_lib.normalize_image(x_u8)
    recon = np.asarray(rec(state.params, x))
    proc0 = jax.process_index() == 0
    if proc0:
        save_image_grid(os.path.join(run_dir, f'samples_{step}.png'),
                        samples)
        both = np.stack([np.asarray(x), recon], 1).reshape(
            -1, *recon.shape[1:])
        save_image_grid(os.path.join(run_dir, f'recon_{step}.png'), both,
                        ncol=16)

    # latent scatter (reference's qualitative latent plots)
    from gmvae_tpu import api as api_lib
    from gmvae_tpu.utils.logging import save_latent_plot
    n = min(2048, len(trainer.dataset.test_x))
    z, _ = api_lib.latent_embed(trainer, state, trainer.dataset.test_x[:n])
    if proc0:
        save_latent_plot(os.path.join(run_dir, f'latent_{step}.png'), z,
                         trainer.dataset.test_y[:n])
