"""Distribution math core: the spec oracle for the whole framework.

Pure jnp functions, no module state. Everything downstream (the Flax model,
the training loop, and the fused Pallas kernel in ``ops/kernels/fused_elbo.py``)
is validated against these closed forms.

Parity notes (reference behavior per /root/repo/BASELINE.json:5 — the
reference mount is empty, see SURVEY.md §0):
  * mixture prior  = log-sum-exp over K Gaussian components
  * categorical reparameterization = Gumbel-softmax (Jang et al.,
    arXiv:1611.01144; Concrete GMVAE, arXiv:1909.08994)
  * continuous reparameterization = Gaussian ``z = mu + sigma * eps``
    with threefry PRNG keys

Conventions
-----------
* Diagonal Gaussians are parameterized by ``(mean, logvar)``.
* ``logvar`` is clamped to ``[LOGVAR_MIN, LOGVAR_MAX]`` at density/sampling
  boundaries so a diverging encoder head cannot produce inf/NaN.
* Log-densities sum over the trailing event axis (axis=-1) and keep all
  leading batch axes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)
# Variance in [e^-12, e^12] ~ [6e-6, 1.6e5]: wide enough to be inert for
# trained models, tight enough to keep exp()/division finite in f32.
LOGVAR_MIN = -12.0
LOGVAR_MAX = 12.0
# Gumbel sampling: clamp uniforms away from {0, 1} before the double log.
_UNIFORM_EPS = 1e-12


def clamp_logvar(logvar: jax.Array) -> jax.Array:
    """Clamp log-variance to the numerically safe band."""
    return jnp.clip(logvar, LOGVAR_MIN, LOGVAR_MAX)


# ---------------------------------------------------------------------------
# Diagonal Gaussian
# ---------------------------------------------------------------------------


def gauss_logpdf(z: jax.Array, mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """log N(z; mean, diag(exp(logvar))), summed over the last axis.

    Shapes broadcast: ``z[..., D]`` against ``mean/logvar[..., D]``.
    """
    logvar = clamp_logvar(logvar)
    quad = jnp.square(z - mean) * jnp.exp(-logvar)
    return -0.5 * jnp.sum(quad + logvar + LOG2PI, axis=-1)


def gauss_sample(key: jax.Array, mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """Reparameterized sample ``z = mean + exp(logvar/2) * eps``, eps~N(0,I)."""
    logvar = clamp_logvar(logvar)
    eps = jax.random.normal(key, jnp.broadcast_shapes(mean.shape, logvar.shape),
                            dtype=mean.dtype)
    return mean + jnp.exp(0.5 * logvar) * eps


def gauss_kl(mean_q: jax.Array, logvar_q: jax.Array,
             mean_p: jax.Array | None = None,
             logvar_p: jax.Array | None = None) -> jax.Array:
    """Analytic KL(N_q || N_p) for diagonal Gaussians, summed over last axis.

    With ``mean_p``/``logvar_p`` omitted, the prior is standard normal.
    """
    logvar_q = clamp_logvar(logvar_q)
    if mean_p is None and logvar_p is None:
        # KL(N(m, v) || N(0, 1)) = 0.5 * sum(v + m^2 - 1 - log v)
        return 0.5 * jnp.sum(
            jnp.exp(logvar_q) + jnp.square(mean_q) - 1.0 - logvar_q, axis=-1)
    mean_p = jnp.asarray(0.0 if mean_p is None else mean_p)
    logvar_p = clamp_logvar(jnp.asarray(0.0 if logvar_p is None else logvar_p))
    var_ratio = jnp.exp(logvar_q - logvar_p)
    quad = jnp.square(mean_q - mean_p) * jnp.exp(-logvar_p)
    return 0.5 * jnp.sum(var_ratio + quad - 1.0 + logvar_p - logvar_q, axis=-1)


# ---------------------------------------------------------------------------
# Mixture of diagonal Gaussians (the GM prior / mixture posterior)
# ---------------------------------------------------------------------------


def mixture_logpdf(z: jax.Array, log_weights: jax.Array,
                   means: jax.Array, logvars: jax.Array) -> jax.Array:
    """``log sum_k exp(log_weights_k + log N(z; means_k, logvars_k))``.

    This is the reference's mixture-prior log-density: log-sum-exp over K
    Gaussian components (BASELINE.json:5).

    Args:
      z:           ``[..., D]`` points.
      log_weights: ``[K]`` or ``[..., K]`` log mixture weights. Need not be
                   normalized here; pass ``jax.nn.log_softmax`` output for a
                   proper density.
      means:       ``[K, D]`` or ``[..., K, D]`` component means.
      logvars:     same shape as ``means``.

    Returns:
      ``[...]`` mixture log-density.
    """
    comp = gauss_logpdf(z[..., None, :], means, logvars)  # [..., K]
    return jax.scipy.special.logsumexp(log_weights + comp, axis=-1)


# ---------------------------------------------------------------------------
# Categorical: Gumbel-softmax / Concrete relaxation
# ---------------------------------------------------------------------------


def sample_gumbel(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard Gumbel(0,1) noise via -log(-log U)."""
    u = jax.random.uniform(key, shape, dtype=dtype,
                           minval=_UNIFORM_EPS, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def gumbel_softmax(key: jax.Array, logits: jax.Array, tau: jax.Array,
                   hard: bool = False) -> jax.Array:
    """Concrete/Gumbel-softmax sample ``y = softmax((logits + g) / tau)``.

    With ``hard=True``, returns the straight-through one-hot: forward pass is
    ``one_hot(argmax(y))``, backward pass flows through the relaxed ``y``.
    arXiv:1611.01144 eq. (1)-(2).
    """
    g = sample_gumbel(key, logits.shape, logits.dtype)
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        y_hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), logits.shape[-1],
                                dtype=y.dtype)
        # Straight-through: hard one-hot forward, relaxed gradient backward.
        # Parenthesized so the value is exactly one-hot (no reassociation).
        y = y_hard + (y - jax.lax.stop_gradient(y))
    return y


def categorical_kl(logits_q: jax.Array, log_prior: jax.Array) -> jax.Array:
    """KL(Cat(softmax(logits_q)) || Cat(exp(log_prior))), last axis is K.

    ``log_prior`` must be normalized (e.g. ``jax.nn.log_softmax(pi_logits)``).
    """
    log_q = jax.nn.log_softmax(logits_q, axis=-1)
    q = jnp.exp(log_q)
    return jnp.sum(q * (log_q - log_prior), axis=-1)


def temperature_schedule(step: jax.Array, tau0: float = 1.0,
                         tau_min: float = 0.5,
                         anneal_rate: float = 3e-5) -> jax.Array:
    """Exponential Gumbel-softmax temperature anneal (arXiv:1611.01144 §4).

    ``tau(step) = max(tau_min, tau0 * exp(-anneal_rate * step))``. The floor
    keeps the relaxation away from the low-temperature NaN regime
    (SURVEY.md §7.3 hard part #2).
    """
    step = jnp.asarray(step, jnp.float32)
    return jnp.maximum(tau_min, tau0 * jnp.exp(-anneal_rate * step))


# ---------------------------------------------------------------------------
# Likelihoods
# ---------------------------------------------------------------------------


def bernoulli_ll(x: jax.Array, logits: jax.Array) -> jax.Array:
    """``sum log Bernoulli(x; sigmoid(logits))`` over all trailing event axes.

    ``x`` in [0, 1] (binarized or probabilistic targets both valid). Stable
    formulation: ``x*l - softplus(l)``  ==  ``x*log(p) + (1-x)*log(1-p)``.
    Sums over every axis after the first (batch) axis.
    """
    ll = x * logits - jax.nn.softplus(logits)
    return jnp.sum(ll.reshape(ll.shape[0], -1), axis=-1)


def gaussian_ll(x: jax.Array, mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """Diag-Gaussian log-likelihood over all trailing event axes (color data)."""
    logvar = clamp_logvar(jnp.broadcast_to(logvar, mean.shape))
    ll = -0.5 * (jnp.square(x - mean) * jnp.exp(-logvar) + logvar + LOG2PI)
    return jnp.sum(ll.reshape(ll.shape[0], -1), axis=-1)
