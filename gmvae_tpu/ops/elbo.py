"""Mixture-ELBO head: the per-step hot loop, in reference (jnp) form.

This is the exact computation that ``ops/kernels/fused_elbo.py`` fuses into a
single Pallas TPU kernel (BASELINE.json:5: "the mixture-prior ELBO —
log-sum-exp over K Gaussian components, Gumbel-softmax categorical
reparameterization, and Gaussian reparameterized sampling with on-chip
threefry PRNG — fuses into a single Pallas kernel"). The jnp path here is the
golden reference the kernel must match bit-for-intent, and is itself the
"reference behavior" oracle (SURVEY.md §6: no published reference numbers
exist; the faithful jnp implementation defines them).

The head sits between the encoder and the decoder:

    encoder(x) -> (k_logits [B,K], q_means [B,K,D], q_logvars [B,K,D])
    head       -> z [B,D] + all per-sample ELBO scalars
    decoder(z) -> likelihood params; log p(x|z) is added by the caller.

Two ELBO assemblies are supported (both computed; ``elbo_form`` picks):

  "mixture"    ELBO = log p(x|z) + log p(z) - log q(z|x)
               with p(z)   = sum_k pi_k N(z; prior_k)      (LSE over K)
               and  q(z|x) = sum_k q(k|x) N(z; q_k(x))     (LSE over K),
               z sampled from the mixture posterior by Gumbel-softmax
               component relaxation + Gaussian reparameterization.

  "structured" ELBO = log p(x|z) + log p(z|y) - log q(z|x,y)
                      - KL(q(k|x) || Cat(pi))
               with y the relaxed one-hot and p(z|y)/q(z|x,y) the
               y-interpolated diagonal Gaussians (Concrete GMVAE,
               arXiv:1909.08994 eq. 3-5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gmvae_tpu.ops import dists


class MixturePrior(NamedTuple):
    """Learned GM prior parameters: p(k) = Cat(softmax(pi_logits)),
    p(z|k) = N(means[k], exp(logvars[k]))."""
    pi_logits: jax.Array   # [K]
    means: jax.Array       # [K, D]
    logvars: jax.Array     # [K, D]


class HeadOutputs(NamedTuple):
    """Everything the ELBO needs from the latent head, per batch element."""
    z: jax.Array            # [B, D]  reparameterized latent sample
    y: jax.Array            # [B, K]  relaxed one-hot component selection
    log_prior_mix: jax.Array   # [B]  log p(z)        (LSE over K, prior)
    log_q_mix: jax.Array       # [B]  log q(z|x)      (LSE over K, posterior)
    log_p_cond: jax.Array      # [B]  log p(z|y)      (y-interpolated prior)
    log_q_cond: jax.Array      # [B]  log q(z|x,y)    (y-interpolated posterior)
    kl_cat: jax.Array          # [B]  KL(q(k|x) || Cat(pi))


def head_from_noise(g: jax.Array,
                    eps: jax.Array,
                    k_logits: jax.Array,
                    q_means: jax.Array,
                    q_logvars: jax.Array,
                    prior: MixturePrior,
                    tau: jax.Array,
                    hard: bool = False) -> HeadOutputs:
    """Deterministic core of the mixture-ELBO head, noise passed in.

    This is THE definition of the head's math: ``mixture_elbo_head`` draws
    ``(g, eps)`` with threefry and delegates here, and the fused Pallas
    kernel's backward pass replays the identical function with the noise the
    kernel emitted as residuals — so kernel and golden path share one
    formula.

    Args:
      g:    [B, K] standard Gumbel(0,1) noise for the categorical relaxation.
      eps:  [B, D] standard normal noise for the Gaussian reparameterization.
      (rest as in ``mixture_elbo_head``.)
    """
    # --- Gumbel-softmax categorical reparameterization -------------------
    y = jax.nn.softmax((k_logits + g) / tau, axis=-1)               # [B, K]
    if hard:
        y_hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), k_logits.shape[-1],
                                dtype=y.dtype)
        y = y_hard + (y - jax.lax.stop_gradient(y))  # straight-through

    # --- Gaussian reparameterized sampling from the selected component ---
    q_logvars = dists.clamp_logvar(q_logvars)
    hi = jax.lax.Precision.HIGHEST  # tiny contractions; keep the oracle f32-exact
    mean = jnp.einsum('bk,bkd->bd', y, q_means, precision=hi)       # [B, D]
    logvar = jnp.einsum('bk,bkd->bd', y, q_logvars, precision=hi)   # [B, D]
    z = mean + jnp.exp(0.5 * logvar) * eps                          # [B, D]

    # --- densities: LSE over K (the mixture-prior hot loop) --------------
    log_pi = jax.nn.log_softmax(prior.pi_logits)                    # [K]
    log_qk = jax.nn.log_softmax(k_logits, axis=-1)                  # [B, K]

    log_prior_mix = dists.mixture_logpdf(z, log_pi, prior.means,
                                         prior.logvars)             # [B]
    log_q_mix = dists.mixture_logpdf(z, log_qk, q_means, q_logvars)  # [B]

    # --- conditional (y-interpolated) densities for the structured form --
    p_mean = jnp.einsum('bk,kd->bd', y, prior.means, precision=hi)
    p_logvar = jnp.einsum('bk,kd->bd', y, dists.clamp_logvar(prior.logvars),
                          precision=hi)
    log_p_cond = dists.gauss_logpdf(z, p_mean, p_logvar)            # [B]
    log_q_cond = dists.gauss_logpdf(z, mean, logvar)                # [B]

    kl_cat = dists.categorical_kl(k_logits, log_pi)                 # [B]

    return HeadOutputs(z=z, y=y,
                       log_prior_mix=log_prior_mix, log_q_mix=log_q_mix,
                       log_p_cond=log_p_cond, log_q_cond=log_q_cond,
                       kl_cat=kl_cat)


def mixture_elbo_head(key: jax.Array,
                      k_logits: jax.Array,
                      q_means: jax.Array,
                      q_logvars: jax.Array,
                      prior: MixturePrior,
                      tau: jax.Array,
                      hard: bool = False) -> HeadOutputs:
    """Reference jnp implementation of the fused mixture-ELBO head.

    Args:
      key:       threefry PRNG key; split internally for Gumbel and Gaussian
                 noise so the fused kernel can replay both streams.
      k_logits:  [B, K] posterior component logits q(k|x).
      q_means:   [B, K, D] per-component posterior means.
      q_logvars: [B, K, D] per-component posterior log-variances.
      prior:     learned mixture prior parameters.
      tau:       Gumbel-softmax temperature (scalar).
      hard:      straight-through one-hot selection if True.
    """
    key_g, key_z = jax.random.split(key)
    g = dists.sample_gumbel(key_g, k_logits.shape, k_logits.dtype)
    eps = jax.random.normal(key_z, (k_logits.shape[0], q_means.shape[-1]),
                            k_logits.dtype)
    return head_from_noise(g, eps, k_logits, q_means, q_logvars, prior, tau,
                           hard=hard)


def assemble_elbo(log_px_z: jax.Array, head: HeadOutputs,
                  elbo_form: str = 'mixture',
                  kl_weight: jax.Array | float = 1.0) -> jax.Array:
    """Per-sample ELBO in nats, from the likelihood term and head outputs.

    ``kl_weight`` scales the divergence terms (beta-VAE style warmup; 1.0 is
    the plain ELBO that gets *reported* — training may anneal it).
    """
    if elbo_form == 'mixture':
        kl_est = head.log_q_mix - head.log_prior_mix
    elif elbo_form == 'structured':
        kl_est = head.log_q_cond - head.log_p_cond + head.kl_cat
    else:
        raise ValueError(f'unknown elbo_form: {elbo_form!r}')
    return log_px_z - kl_weight * kl_est
