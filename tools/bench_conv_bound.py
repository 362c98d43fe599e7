"""Quantify what binds the conv configs: time the encoder+decoder stacks
ALONE (fwd+bwd+sgd, no mixture head, no likelihood, no optimizer state)
and compare against the full train step (VERDICT r2 #2: 'a quantified
proof it sits at its bound').

If conv-only throughput ~= full-step throughput, the step time is the
convolutions' MXU schedule — a property of XLA's conv codegen at these
shapes — and no framework-side work outside the convs can move the row
materially.

    python tools/bench_conv_bound.py cifar_k20 svhn_conv
"""

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gmvae_tpu import configs
from gmvae_tpu.models import nets


def conv_only_rate(name: str, steps: int = 2000, inner: int = 100) -> dict:
    cfg = configs.get_config(name)
    # the same arch dispatch every model variant uses (mlp takes hidden=,
    # conv/resnet take features= — nets.make_* owns that difference)
    enc = nets.make_encoder(cfg)
    dec = nets.make_decoder(cfg)
    b = cfg.batch_size
    x = jax.random.uniform(jax.random.PRNGKey(1), (b, *cfg.image_shape))
    z0 = jnp.zeros((b, cfg.latent_dim), jnp.float32)
    enc_dec = {
        'encoder': enc.init(jax.random.PRNGKey(0), x)['params'],
        'decoder': dec.init(jax.random.PRNGKey(2), z0)['params'],
    }

    def loss(p, x):
        feats = enc.apply({'params': p['encoder']}, x)
        # decoder driven by a feats-derived latent so both stacks are live
        z = z0 + feats[:, :cfg.latent_dim]
        out = dec.apply({'params': p['decoder']}, z)
        return jnp.mean(jnp.square(out - 0.5)) + 1e-6 * jnp.mean(feats)

    @jax.jit
    def chunk(p, x):
        def body(p, _):
            l, g = jax.value_and_grad(loss)(p, x)
            return jax.tree.map(lambda a, d: a - 1e-4 * d, p, g), l
        return jax.lax.scan(body, p, jnp.arange(inner))

    p, losses = chunk(enc_dec, x)                        # compile
    float(np.asarray(losses[-1]))
    t0 = time.perf_counter()
    n = max(1, steps // inner)
    for _ in range(n):
        p, losses = chunk(p, x)
    float(np.asarray(losses[-1]))
    dt = time.perf_counter() - t0
    return {'config': name, 'conv_only_img_per_sec': round(n * inner * b
                                                           / dt, 1)}


def main():
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    for name in (sys.argv[1:] or ['cifar_k20', 'svhn_conv']):
        print(json.dumps(conv_only_rate(name)), flush=True)


if __name__ == '__main__':
    main()
