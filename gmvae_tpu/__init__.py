"""gmvae_tpu: TPU-native deep mixture-of-Gaussians VAE framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ffs97/deep-mixture-vae`` (see /root/repo/SURVEY.md; the binding spec is
/root/repo/BASELINE.json — the reference mount is empty, SURVEY.md §0).

Public API (BASELINE.json:5): ``train``, ``eval_elbo``, ``sample``,
``reconstruct``, ``cluster_assign``.
"""

import importlib.metadata

from gmvae_tpu.api import (cluster_assign, cluster_metrics, eval_elbo,
                           latent_embed, reconstruct, sample, train)
from gmvae_tpu.configs import CONFIGS, Config, get_config
from gmvae_tpu.serving import export_verb

try:
    # single source of truth: pyproject.toml [project] version
    __version__ = importlib.metadata.version('gmvae-tpu')
except importlib.metadata.PackageNotFoundError:  # running from a checkout
    __version__ = '0.0.0+uninstalled'

__all__ = [
    'train', 'eval_elbo', 'sample', 'reconstruct', 'cluster_assign',
    'cluster_metrics', 'latent_embed', 'export_verb', 'Config', 'CONFIGS',
    'get_config', '__version__',
]
