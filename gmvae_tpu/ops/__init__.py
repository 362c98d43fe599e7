"""Math core and TPU kernels: distributions, ELBO head, Pallas fusions."""

from gmvae_tpu.ops import dists, elbo
from gmvae_tpu.ops.elbo import MixturePrior, HeadOutputs, mixture_elbo_head, assemble_elbo

__all__ = [
    'dists', 'elbo', 'MixturePrior', 'HeadOutputs', 'mixture_elbo_head',
    'assemble_elbo',
]
