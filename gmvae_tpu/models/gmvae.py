"""The GMVAE model: encoder -> mixture-ELBO head -> decoder.

One Flax module covering every BASELINE config; the architecture family,
K, latent dim, and likelihood come from ``configs.Config``
(reference behavior per BASELINE.json:5-11 — the reference's per-variant
model classes collapse into one config-driven module here, SURVEY.md §2.1).

The latent head (Gumbel-softmax + reparam sampling + mixture densities) is
pluggable: the default is the jnp golden path ``ops.elbo.mixture_elbo_head``;
the training loop swaps in the fused Pallas kernel on TPU (``cfg.fused``).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gmvae_tpu.configs import Config
from gmvae_tpu.models import nets
from gmvae_tpu.ops import dists
from gmvae_tpu.ops.elbo import (HeadOutputs, MixturePrior, assemble_elbo,
                                mixture_elbo_head)


def split_like_params(cfg: Config, dec_out: jax.Array):
    """Decoder output -> likelihood params: logits (bernoulli) or a
    (mean, logvar) pair with ``cfg.dec_logvar_min`` flooring the predicted
    log-variance (gaussian). Shared by every model variant."""
    if cfg.likelihood == 'gaussian':
        mean, logvar = jnp.split(dec_out, 2, axis=-1)
        return mean, jnp.clip(logvar, cfg.dec_logvar_min, dists.LOGVAR_MAX)
    return dec_out


def log_likelihood(cfg: Config, x: jax.Array, like_params) -> jax.Array:
    """Per-sample log p(x|z) for either likelihood family."""
    if cfg.likelihood == 'gaussian':
        mean, logvar = like_params
        return dists.gaussian_ll(x, mean, logvar)
    return dists.bernoulli_ll(x, like_params)


def likelihood_mean(cfg: Config, like_params) -> jax.Array:
    """E[x|z] — the image-space output of sample/reconstruct."""
    if cfg.likelihood == 'gaussian':
        return like_params[0]
    return jax.nn.sigmoid(like_params)


class GMVAE(nn.Module):
    cfg: Config
    head_fn: Callable = staticmethod(mixture_elbo_head)

    def setup(self):
        cfg = self.cfg
        k, d = cfg.n_components, cfg.latent_dim
        self.encoder = nets.make_encoder(cfg)
        self.decoder = nets.make_decoder(cfg)

        # posterior heads over encoder features
        self.k_head = nn.Dense(k, name='k_head')
        self.mean_head = nn.Dense(k * d, name='mean_head')
        self.logvar_head = nn.Dense(
            k * d, name='logvar_head',
            kernel_init=nn.initializers.zeros,   # start q near unit variance
        )

        # learned mixture prior p(k), p(z|k)
        self.pi_logits = self.param('pi_logits', nn.initializers.zeros, (k,))
        self.prior_means = self.param(
            'prior_means', nn.initializers.normal(stddev=cfg.prior_init_std),
            (k, d))
        self.prior_logvars = self.param(
            'prior_logvars', nn.initializers.zeros, (k, d))

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """x -> (k_logits [B,K], q_means [B,K,D], q_logvars [B,K,D])."""
        k, d = self.cfg.n_components, self.cfg.latent_dim
        feats = self.encoder(x)
        k_logits = self.k_head(feats)
        q_means = self.mean_head(feats).reshape(-1, k, d)
        q_logvars = self.logvar_head(feats).reshape(-1, k, d)
        return k_logits, q_means, q_logvars

    def decode(self, z: jax.Array):
        """z -> likelihood params: logits [B,*img] (bernoulli) or
        (mean, logvar) each [B,*img] (gaussian). ``cfg.dec_logvar_min``
        floors the predicted log-variance (see configs.Config)."""
        return split_like_params(self.cfg, self.decoder(z))

    def prior(self) -> MixturePrior:
        return MixturePrior(pi_logits=self.pi_logits,
                            means=self.prior_means,
                            logvars=self.prior_logvars)

    def log_likelihood(self, x: jax.Array, like_params) -> jax.Array:
        return log_likelihood(self.cfg, x, like_params)

    # ------------------------------------------------------------------
    # objectives / verbs
    # ------------------------------------------------------------------

    def elbo_terms(self, x: jax.Array, key: jax.Array, tau: jax.Array):
        """Per-sample ELBO pieces for a batch. Returns (elbo [B], aux dict)."""
        k_logits, q_means, q_logvars = self.encode(x)
        head: HeadOutputs = self.head_fn(key, k_logits, q_means, q_logvars,
                                         self.prior(), tau,
                                         hard=self.cfg.hard_gumbel)
        like_params = self.decode(head.z)
        log_px_z = self.log_likelihood(x, like_params)
        elbo = assemble_elbo(log_px_z, head, self.cfg.elbo_form)
        aux = {
            'elbo': elbo,
            'log_px_z': log_px_z,
            'kl_cat': head.kl_cat,
            'kl_z': (head.log_q_mix - head.log_prior_mix
                     if self.cfg.elbo_form == 'mixture'
                     else head.log_q_cond - head.log_p_cond),
            'k_logits': k_logits,
        }
        return elbo, aux

    def __call__(self, x: jax.Array, key: jax.Array, tau: jax.Array):
        return self.elbo_terms(x, key, tau)

    def cluster_logits(self, x: jax.Array) -> jax.Array:
        """q(k|x) logits — argmax is the cluster assignment (SURVEY.md §3.4)."""
        k_logits, _, _ = self.encode(x)
        return k_logits

    def latent(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Deterministic latent embedding: (posterior-mean z [B,D],
        cluster probs q(k|x) [B,K]). The reference's latent-plot quantity."""
        k_logits, q_means, _ = self.encode(x)
        q = jax.nn.softmax(k_logits, axis=-1)
        z = jnp.einsum('bk,bkd->bd', q, q_means)
        return z, q

    def reconstruct(self, x: jax.Array) -> jax.Array:
        """Deterministic reconstruction: soft posterior mean latent -> decode
        -> likelihood mean (SURVEY.md §3.3)."""
        z, _ = self.latent(x)
        return likelihood_mean(self.cfg, self.decode(z))

    def sample(self, key: jax.Array, n: int,
               component: int | None = None) -> jax.Array:
        """Generative sampling: k ~ Cat(pi) (or fixed), z ~ N(mu_k, s_k),
        x = likelihood mean (SURVEY.md §3.3)."""
        key_k, key_z = jax.random.split(key)
        prior = self.prior()
        if component is None:
            ks = jax.random.categorical(key_k, prior.pi_logits, shape=(n,))
        else:
            k = self.cfg.n_components
            if not 0 <= int(component) < k:
                # jnp's clamped gather would otherwise silently sample
                # component k-1 for any out-of-range request
                raise ValueError(f'component must be in [0, {k}), '
                                 f'got {component}')
            ks = jnp.full((n,), component, jnp.int32)
        mean = prior.means[ks]
        logvar = prior.logvars[ks]
        z = dists.gauss_sample(key_z, mean, logvar)
        return likelihood_mean(self.cfg, self.decode(z))


def init_params(model: GMVAE, rng: jax.Array):
    """Initialize model parameters (threefry key plumbing)."""
    x = jnp.zeros((2, *model.cfg.image_shape), jnp.float32)
    variables = model.init({'params': rng}, x, jax.random.PRNGKey(0),
                           jnp.float32(1.0))
    return variables['params']


def param_count(params) -> int:
    return sum(math.prod(p.shape) for p in jax.tree.leaves(params))
