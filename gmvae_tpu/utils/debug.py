"""NaN/inf provenance on the ELBO path via jax.experimental.checkify.

SURVEY.md §5.2: the Gumbel-softmax at low temperature is the NaN hotspot;
``--debug`` turns on ``jax_debug_nans`` globally, and ``checked_elbo`` gives
term-level provenance: it re-runs one ELBO evaluation with float checks and
reports WHICH head output went non-finite, instead of a bare NaN loss.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from gmvae_tpu.ops import dists


def checked_elbo(model, params, x: jax.Array, key: jax.Array,
                 tau: jax.Array) -> Tuple[str | None, dict]:
    """Run one ELBO evaluation with per-term finiteness checks.

    Returns ``(error_message_or_None, per_term_finite_flags)``. Pure-Python
    entry (not for the hot loop) — call it from a debugger or the CLI when a
    run NaNs out.
    """

    def fn(params, x, key, tau):
        elbo, aux = model.apply({'params': params}, x, key, tau)
        for name in ('elbo', 'log_px_z', 'kl_cat', 'kl_z'):
            checkify.check(jnp.isfinite(aux[name]).all(),
                           f'non-finite {name} '
                           '(tau={tau}; see SURVEY.md §7.3 #2)',
                           tau=tau)
        return elbo, aux

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    err, (elbo, aux) = jax.jit(checked)(params, x, key, tau)
    msg = err.get()
    flags = {name: bool(jnp.isfinite(aux[name]).all())
             for name in ('elbo', 'log_px_z', 'kl_cat', 'kl_z')}
    return msg, flags


def tau_floor_audit(cfg) -> dict:
    """Static audit of the temperature schedule against the NaN regime."""
    taus = [float(dists.temperature_schedule(s, cfg.tau0, cfg.tau_min,
                                             cfg.tau_anneal))
            for s in (0, cfg.steps // 2, cfg.steps)]
    return {'tau_start': taus[0], 'tau_mid': taus[1], 'tau_end': taus[2],
            'floor_respected': min(taus) >= cfg.tau_min > 0}
