"""Fused mixture-ELBO head as a single Pallas TPU kernel.

BASELINE.json:5 north-star: "the mixture-prior ELBO — log-sum-exp over K
Gaussian components, Gumbel-softmax categorical reparameterization, and
Gaussian reparameterized sampling with on-chip threefry PRNG — fuses into a
single Pallas kernel so the per-step hot loop is one XLA program."

Drop-in replacement for ``ops.elbo.mixture_elbo_head`` (same signature, same
``HeadOutputs``), validated against that jnp golden path in
``tests/test_kernel.py``.

STATUS: stub — falls back to the jnp reference path. The real kernel lands in
the Pallas milestone (SURVEY.md §7.2 step 5); ``is_supported()`` gates the
swap so the training loop can already be written against this interface.
"""

from __future__ import annotations

from gmvae_tpu.ops.elbo import mixture_elbo_head


def is_supported() -> bool:
    """Whether the fused Pallas path is available on the current backend."""
    return False


# Placeholder: identical behavior to the golden path until the kernel lands.
fused_mixture_elbo = mixture_elbo_head
