"""Frozen dataclass configs — one named constructor per BASELINE config.

BASELINE.json:7-11 fixes five configs; SURVEY.md §5.6 fixes the mechanism
(plain frozen dataclasses, ``--set key=value`` CLI overrides, no external
config framework).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # identity
    name: str = 'mnist_k10'
    dataset: str = 'mnist'            # mnist|fmnist|svhn|cifar10|celeba|synthetic
    image_shape: Tuple[int, int, int] = (28, 28, 1)

    # model
    arch: str = 'mlp'                 # mlp|conv|resnet
    enc_hidden: Tuple[int, ...] = (512, 512)   # widths (mlp) / features (conv)
    dec_hidden: Tuple[int, ...] = (512, 512)
    latent_dim: int = 10
    n_components: int = 10            # K mixture components
    likelihood: str = 'bernoulli'     # bernoulli|gaussian
    # 'gmvae' (models/gmvae.py, incl. the K=1 plain VAE) or 'deep'
    # (models/deep.py — hierarchical w-latent mixture, arXiv:1611.02648);
    # SURVEY.md §1.1 "one class per variant: plain VAE, GMVAE, deep-mixture"
    model_family: str = 'gmvae'       # gmvae|deep
    w_dim: int = 32                   # deep variant: top-level latent dim
    prior_hidden: int = 128           # deep variant: prior-net hidden width

    # objective. Default is the Concrete-GMVAE 'structured' form
    # (arXiv:1909.08994). Measured at K=10 (4k steps, v5e, balance_weight=5):
    # structured ACC 1.00/NMI 1.00; 'mixture'+hard ACC 0.75/NMI 0.86
    # (without the balance regularizer both forms merge components:
    # 0.61/0.82 and 0.10/0.0 respectively). The 'mixture' form (marginal
    # LSE prior AND LSE posterior) requires hard=True: with soft weights z
    # interpolates between components and -log q(z|x) under the hard
    # mixture diverges.
    elbo_form: str = 'structured'     # mixture|structured (ops/elbo.py)
    hard_gumbel: bool = False
    tau0: float = 1.0
    tau_min: float = 0.5
    tau_anneal: float = 3e-5
    kl_warmup_steps: int = 0          # linear beta warmup; 0 disables
    prior_init_std: float = 1.0       # init spread of mixture-prior means
    # weight on KL(batch-mean q(k|x) || uniform): discourages merged/dead
    # mixture components (0 disables; regularizer only, never in the
    # reported ELBO). Measured on the MNIST-shaped 10-cluster stand-in
    # (v5e, 4k steps): ACC 0.60->1.00, NMI 0.85->1.00, trained ELBO also
    # improves (-227.3 -> -226.8); see BASELINE.md.
    balance_weight: float = 5.0
    # weight on E_x[H(q(k|x))] (assignment confidence). Together with the
    # balance term this regularizes with the mutual information
    # I(k;x) = H(mean_x q) - E_x[H(q)] (RIM-style). Measured on the
    # svhn_conv stand-in (r2 sweep): conf 20 with balance 5 COLLAPSES
    # assignments (ACC 0.11) — a stronger balance term alone is what fixes
    # the conv configs (0.62 -> 0.90 at balance 20); conf stays available
    # but defaults off.
    conf_weight: float = 0.0
    # floor on the DECODER's predicted log-variance (gaussian likelihood
    # only; dists.LOGVAR_MIN=-12 is the numerical bound). Raising it caps
    # how many nats per pixel reconstruction can earn, keeping the KL terms
    # relevant; -4.6 => sigma >= 0.1.
    dec_logvar_min: float = -12.0

    # data
    binarize: bool = True             # dynamic binarization per step [B:5,8]
    batch_size: int = 128

    # optimization
    lr: float = 1e-3
    grad_clip: float = 0.0            # gradient-norm clip; 0 disables.
    # clip formulation: 'global' (one norm over all leaves, optax),
    # 'per_leaf' (block-wise, training.clip_by_leaf_norm — celeba_dp16
    # uses it; see that function's docstring), 'value' (optax.clip).
    grad_clip_impl: str = 'global'
    steps: int = 20_000
    eval_every: int = 2_000
    eval_samples: int = 1             # S-sample eval ELBO + IWAE LSE bound
    seed: int = 0

    # performance
    compute_dtype: str = 'float32'    # float32|bfloat16 (MXU matmul dtype)
    # Adam moment-storage dtype (training.scale_by_adam_lowmem). 'bfloat16'
    # halves the optimizer's HBM working set — the dominant per-step HBM
    # term for the MLP configs (PERF.md roofline) — with f32 arithmetic.
    # Default per named config where measured (PERF.md "bf16 optimizer
    # state"): mnist_k10 +12.5% at 0.005% trained parity, fmnist_deep
    # +21.8% at 0.039%, mnist_deepmix +13.9%, cifar_k20 +8.8% at 0.13%;
    # svhn_conv measured NO gain (+0.3%, conv-bound with a cheap head) and
    # stays float32. The dataclass default stays float32 so ad-hoc Configs
    # get exact optax.adam unless they opt in.
    opt_state_dtype: str = 'float32'  # float32|bfloat16
    fused: bool = True                # Pallas fused ELBO head on TPU
    # fused-head noise source: 'auto' (on-chip threefry on TPU, streamed
    # 'xla' noise off-TPU — ops/kernels/fused_elbo.py resolution), or an
    # explicit override. 'xla' streams draws BIT-EQUAL to the unfused
    # oracle into the kernel, so fused-vs-oracle trained deltas measure
    # ONLY kernel accumulation order, not draw-to-draw chaos — the
    # matched-noise parity protocol (tools/parity_conv.py --matched-noise,
    # VERDICT r3 #2). Not a perf knob: 'threefry' stays the TPU default
    # (on-chip regeneration, zero noise residuals in the backward).
    fused_noise: str = 'auto'         # auto|threefry|xla
    scan_steps: int = 1               # micro-steps per jitted outer step
    # chunk-metrics contract (training._scan_with_metrics): 'stacked'
    # returns per-step [S] metric arrays (the trajectory contract goldens
    # and parity protocols read); 'mean' accumulates a running sum in the
    # scan carry and returns the chunk mean shaped [1] — dropping the seven
    # per-step dynamic-update-slice stacks the profile attributed at
    # 4.6 us/step = 8% of the flagship step (PERF.md r4). Params math is
    # identical either way (bit-equality asserted in tests); fit() never
    # reads per-step metrics, so production MLP configs default to 'mean'
    # where the win was measured.
    metrics_mode: str = 'stacked'     # stacked|mean
    # lax.scan unroll factor for the chunk body (>=1). NOT bit-neutral:
    # XLA fuses across unrolled iterations, reordering float accumulation
    # (measured ~1 ulp param drift after 24 CPU steps — the kernel-tiling
    # chaos class), so production configs stay at 1 to keep trajectories
    # bit-deterministic per binary; the knob exists for measured
    # experiments (PERF.md r4).
    scan_unroll: int = 1

    # parallelism: 1-D data mesh; -1 = all local devices. Slice-ready up to
    # v5e-16 (SURVEY.md §2.2): multi-host uses jax.distributed + process-
    # sharded data, same mesh code.
    dp_devices: int = -1
    # 'replicated': every device holds the full uint8 dataset in HBM and
    # gathers global batch indices (single-host default; trajectory matches
    # the single-device run). 'sharded': the dataset is partitioned over the
    # data axis and each shard samples batches from its own partition —
    # HBM/host memory scales 1/n_dp, required when the dataset outgrows one
    # chip's HBM (CelebA on a v5e-16 pod slice). Multi-host, each process
    # feeds only its own rows (parallel/mesh.py put_sharded/process_shard).
    data_sharding: str = 'replicated'   # replicated|sharded
    # 'device': the uint8 training set is device-resident and the hot loop
    # gathers batches in-program (the default; fastest, needs the dataset
    # to fit in HBM — or 1/n_dp of it with data_sharding='sharded').
    # 'host_stream': the dataset stays in HOST memory; each scan-chunk's
    # batches are gathered on host from the SAME index plan and staged to
    # the device asynchronously while the previous chunk computes (double-
    # buffered by dispatch order — no threads). Trajectories are bit-
    # identical to 'device' mode (tests/test_stream.py); per-chunk staging
    # HBM is scan_steps*batch_size images instead of the whole dataset, so
    # datasets >> HBM can train. Requires data_sharding='replicated'.
    data_placement: str = 'device'      # device|host_stream

    # io
    run_dir: str = 'runs'
    ckpt_every: int = 5_000
    ckpt_keep: int = 3                # retain newest N snapshots; 0 = all

    def replace(self, **kw) -> 'Config':
        return dataclasses.replace(self, **kw)


def mnist_k10(**kw) -> Config:
    """MNIST GMVAE: K=10, 2-layer MLP enc/dec, latent 10, batch 128
    (BASELINE.json:7; CPU-runnable)."""
    # bfloat16 matmuls: measured trained-ELBO parity 3e-5 vs f32 with
    # identical ACC/NMI, ~5% faster (BASELINE.md); scan_steps amortizes
    # dispatch (SURVEY.md §7.3 #4). metrics_mode='mean': fit() never reads
    # per-step metrics, and dropping the seven [S] stacking buffers
    # measured +7.0% same-session on v5e (1,697,640 -> 1,816,604 img/s/
    # chip) at params bit-identical to 'stacked' (PERF.md r4; the 20k
    # trained ELBO reproduced -225.94287109375 bit-for-bit under it).
    # scan_steps=400 (r5): fresh-process interleaved A/B at the 20k-step
    # windowed driver contract measured 400 over 100 at +3.4% (medians
    # 2,309,050 vs 2,232,888; every clean 400-arm sample above every
    # 100-arm sample, 400-arm spread 0.7%);
    # chunk size is a pure dispatch-granularity knob — params bit-identical
    # by test (test_train) and the 20k trained ELBO re-proven bit-for-bit
    # on hardware at 400 (PERF.md "Per-op attribution ... (round 5)").
    return Config(name='mnist_k10', dataset='mnist',
                  compute_dtype='bfloat16', opt_state_dtype='bfloat16',
                  metrics_mode='mean', scan_steps=400).replace(**kw)


def fmnist_deep(**kw) -> Config:
    """Fashion-MNIST GMVAE: K=10, deeper MLP, latent 64, dynamic binarization
    (BASELINE.json:8)."""
    # balance 20 / tau0 2 (the conv-config recipe): the r2 crc32-seeded
    # stand-in lands in a merged-component minimum at the old defaults
    # (ACC 0.89); with the recipe ACC/NMI recover to 1.00 (measured, 10k
    # steps, v5e).
    return Config(
        name='fmnist_deep', dataset='fmnist',
        enc_hidden=(1024, 512, 256), dec_hidden=(256, 512, 1024),
        latent_dim=64, compute_dtype='bfloat16', opt_state_dtype='bfloat16',
        metrics_mode='mean', scan_steps=100, **_CONV_REG,
    ).replace(**kw)


# Conv/ResNet (gaussian-likelihood) configs share a measured regularizer
# setting (r2 sweeps, v5e, 4k-10k steps, 2048-example eval): the round-1
# defaults (balance 5, tau0 1) left conv paths in a merged/split-component
# local minimum (svhn ACC 0.62, cifar 0.62, celeba 0.18). balance_weight=20
# alone lifts svhn to 0.72-1.00 (seed-dependent); adding a hotter Gumbel
# start (tau0=2, anneal 1e-4 so tau stays >1 for the first ~7k steps) makes
# it robust across seeds: svhn ACC 1.00/0.91/1.00 (seeds 0/1/2), cifar
# 0.91/0.91, celeba 0.82 (vs 0.18 base). See BASELINE.md sweep table.
_CONV_REG = dict(balance_weight=20.0, tau0=2.0, tau_anneal=1e-4)


def svhn_conv(**kw) -> Config:
    """SVHN conv-GMVAE: conv encoder/decoder, K=10, latent 128
    (BASELINE.json:9)."""
    return Config(
        name='svhn_conv', dataset='svhn', image_shape=(32, 32, 3),
        arch='conv', enc_hidden=(64, 128, 256), dec_hidden=(256, 128, 64),
        latent_dim=128, likelihood='gaussian', binarize=False,
        compute_dtype='bfloat16', scan_steps=100, grad_clip=1.0, **_CONV_REG,
    ).replace(**kw)


def cifar_k20(**kw) -> Config:
    """CIFAR-10 conv-GMVAE: K=20 components, ResNet-style enc/dec
    (BASELINE.json:10)."""
    return Config(
        name='cifar_k20', dataset='cifar10', image_shape=(32, 32, 3),
        arch='resnet', enc_hidden=(64, 128, 256), dec_hidden=(256, 128, 64),
        latent_dim=128, n_components=20, likelihood='gaussian', binarize=False,
        compute_dtype='bfloat16', opt_state_dtype='bfloat16', scan_steps=100,
        grad_clip=1.0, **_CONV_REG,
    ).replace(**kw)


def celeba_dp16(**kw) -> Config:
    """CelebA 64x64 large-K mixture VAE, data-parallel across a v5e-16 pod
    slice (BASELINE.json:11). ``dp_devices=-1`` shards over whatever mesh is
    present; batch is the GLOBAL batch."""
    return Config(
        name='celeba_dp16', dataset='celeba', image_shape=(64, 64, 3),
        arch='conv', enc_hidden=(64, 128, 256, 512),
        dec_hidden=(512, 256, 128, 64),
        latent_dim=256, n_components=64, likelihood='gaussian', binarize=False,
        batch_size=1024, compute_dtype='bfloat16', scan_steps=50,
        grad_clip=1.0, grad_clip_impl='per_leaf', data_sharding='sharded',
        # K=64: balance 20 leaves the 2k-step smoke seed-fragile (ACC
        # {0.16,0.84,0.82,0.67} over seed x sharding draws); 40 makes every
        # draw strong (0.97/0.89/0.99 over seeds 0-2) and lifts trained
        # ELBO — measured r2, BASELINE.md
        **{**_CONV_REG, 'balance_weight': 40.0},
    ).replace(**kw)


def mnist_vae(**kw) -> Config:
    """Plain-VAE variant: the reference's model family includes a plain VAE
    alongside the mixture models (SURVEY.md §1.1 'one class per variant:
    plain VAE, GMVAE, deep-mixture'); here it is the K=1 degenerate of the
    same config-driven module (models/gmvae.py — single component, the
    Gumbel-softmax relaxation is trivially one-hot, kl_cat == 0, the ELBO
    reduces to the standard reparameterized VAE bound with a learned
    Gaussian prior). Cluster regularizers are meaningless at K=1 and off.
    Inherits mnist_k10's perf defaults, incl. metrics_mode='mean' (ADVICE
    r4: intentional — params bit-identical, baseline ELBO is evaluate()'s,
    which never reads per-step chunk metrics)."""
    return mnist_k10(name='mnist_vae', n_components=1,
                     balance_weight=0.0, conf_weight=0.0).replace(**kw)


def mnist_deepmix(**kw) -> Config:
    """Deep-mixture VAE variant (SURVEY.md §1.1's third model family):
    hierarchical w-latent Gaussian mixture — the prior components'
    (mu_k, sigma_k) are generated by a neural net from w ~ N(0,I), and
    q(k|w,z) is the closed-form responsibility (no Gumbel-softmax);
    models/deep.py, after Dilokthanakul et al. arXiv:1611.02648. MNIST
    shapes: K=10, z dim 64, w dim 32. tau/hard fields are inert here."""
    return Config(
        name='mnist_deepmix', dataset='mnist', model_family='deep',
        latent_dim=64, w_dim=32, prior_hidden=256,
        compute_dtype='bfloat16', opt_state_dtype='bfloat16',
        metrics_mode='mean', scan_steps=100,
    ).replace(**kw)


def synthetic_hard(**kw) -> Config:
    """MNIST-architecture GMVAE on the overlapping-cluster fixture
    (data/loaders.py make_synthetic_hard): the quality-regression
    benchmark whose ACC/NMI are NOT saturated at 1.0 (BASELINE.md r2).
    Inherits mnist_k10's perf defaults, incl. metrics_mode='mean' (ADVICE
    r4: intentional — params bit-identical, baseline ELBO is evaluate()'s,
    which never reads per-step chunk metrics)."""
    base = dict(name='synthetic_hard', dataset='synthetic_hard',
                steps=10_000)
    base.update(kw)
    return mnist_k10(**base)


def synthetic_tiny(**kw) -> Config:
    """Tiny planted-cluster config for tests/CI (SURVEY.md §4.2): 8x8 images,
    2 clusters, small MLP. Deterministic, no downloads."""
    return Config(
        name='synthetic_tiny', dataset='synthetic', image_shape=(8, 8, 1),
        enc_hidden=(64, 64), dec_hidden=(64, 64),
        latent_dim=4, n_components=2, batch_size=64,
        steps=300, eval_every=100, tau_anneal=1e-3, fused=False,
    ).replace(**kw)


CONFIGS = {
    'mnist_k10': mnist_k10,
    'mnist_vae': mnist_vae,
    'mnist_deepmix': mnist_deepmix,
    'fmnist_deep': fmnist_deep,
    'svhn_conv': svhn_conv,
    'cifar_k20': cifar_k20,
    'celeba_dp16': celeba_dp16,
    'synthetic_hard': synthetic_hard,
    'synthetic_tiny': synthetic_tiny,
}


def get_config(name: str, **kw) -> Config:
    if name not in CONFIGS:
        raise KeyError(f'unknown config {name!r}; have {sorted(CONFIGS)}')
    return CONFIGS[name](**kw)


_TUPLE_ELEM_COERCE = {int: int, float: float, str: str}


def parse_overrides(pairs) -> dict:
    """Parse ``key=value`` CLI overrides with dataclass-field-typed coercion.

    Tuple fields coerce each element by the element type of the field's
    default (int/float/str); empty or mixed-type tuple defaults are an
    error rather than a silent int-cast.
    """
    fields = {f.name: f for f in dataclasses.fields(Config)}
    out = {}
    for pair in pairs or []:
        key, _, raw = pair.partition('=')
        if key not in fields:
            raise KeyError(f'unknown config field {key!r}')
        default = getattr(Config(), key)
        if isinstance(default, bool):
            lowered = raw.strip().lower()
            if lowered in ('1', 'true', 'yes'):
                out[key] = True
            elif lowered in ('0', 'false', 'no'):
                out[key] = False
            else:
                # a typo ('ture') must not silently become False
                raise ValueError(
                    f'--set {key}={raw!r}: boolean fields accept '
                    f'1/true/yes or 0/false/no')
        elif isinstance(default, int):
            out[key] = int(raw)
        elif isinstance(default, float):
            out[key] = float(raw)
        elif isinstance(default, tuple):
            elem_types = {type(v) for v in default}
            if len(elem_types) != 1 or (coerce := _TUPLE_ELEM_COERCE.get(
                    next(iter(elem_types)))) is None:
                raise TypeError(
                    f'--set cannot coerce tuple field {key!r}: default has '
                    f'element types {sorted(t.__name__ for t in elem_types)}')
            out[key] = tuple(coerce(v)
                             for v in raw.strip('()').split(',') if v)
        else:
            out[key] = raw
    return out
