"""Quickstart: train a GMVAE, evaluate clustering, generate samples.

Runs anywhere JAX runs (CPU included — this uses the CI-sized synthetic
config so it finishes in ~2 minutes without downloads). Swap the config
name for 'mnist_k10' etc. on real hardware/data.

    python examples/quickstart.py
"""

import os

import numpy as np

import gmvae_tpu as g
from gmvae_tpu.utils.logging import save_image_grid, save_latent_plot


def main():
    out_dir = os.environ.get('GMVAE_QUICKSTART_DIR', '/tmp/gmvae_quickstart')

    # 1) train — the four reference verbs start here
    trainer, state, history = g.train('synthetic_tiny', steps=300,
                                      eval_every=100, scan_steps=20,
                                      run_dir=out_dir)
    print('final eval row:', history[-1])

    # 2) eval ELBO (nats) + clustering ACC/NMI on the test set
    print('eval_elbo:', g.eval_elbo(trainer, state))

    # 3) generate + reconstruct
    imgs = g.sample(trainer, state, n=16, seed=0)
    save_image_grid(os.path.join(out_dir, 'samples.png'), imgs)
    recon = g.reconstruct(trainer, state, trainer.dataset.test_x[:16])
    save_image_grid(os.path.join(out_dir, 'recon.png'), recon)

    # 4) cluster assignment + metrics on raw images
    yhat = g.cluster_assign(trainer, state, trainer.dataset.test_x[:512])
    print('cluster_metrics:',
          g.cluster_metrics(trainer.dataset.test_y[:512], yhat))

    # 5) latent embedding scatter
    z, probs = g.latent_embed(trainer, state, trainer.dataset.test_x[:512])
    save_latent_plot(os.path.join(out_dir, 'latent.png'), z,
                     trainer.dataset.test_y[:512])
    print('artifacts in', out_dir, '->', sorted(os.listdir(out_dir)))
    assert np.isfinite(z).all()

    # 6) AOT serving export: one self-contained batch-polymorphic artifact
    #    per inference verb; the serving side needs only jax
    #    (gmvae_tpu/serving.py; HTTP front: tools/serve_http.py)
    artifact = os.path.join(out_dir, 'assign.jaxexport')
    g.export_verb(trainer, state, 'assign', path=artifact)
    from jax import export as jexport
    fn = jexport.deserialize(open(artifact, 'rb').read())
    x = trainer.dataset.test_x[:32].astype(np.float32) / 255.0
    assert (np.asarray(fn.call(x)) == yhat[:32]).all()
    print('serving artifact:', artifact,
          f'({os.path.getsize(artifact)} bytes, any batch size)')

    # 7) the other two model families share the identical verb surface:
    #    the plain VAE is the K=1 degenerate config ('mnist_vae' at real
    #    scale), the deep-mixture variant is model_family='deep'
    #    ('mnist_deepmix' at real scale; models/deep.py)
    for name, kw in [('plain VAE', dict(n_components=1, balance_weight=0.0)),
                     ('deep-mixture', dict(model_family='deep', w_dim=4,
                                           prior_hidden=16))]:
        tr, st, hist = g.train('synthetic_tiny', steps=100, eval_every=100,
                               scan_steps=20, run_dir=out_dir, **kw)
        print(f'{name}: eval_elbo:', g.eval_elbo(tr, st)['elbo_nats'])


if __name__ == '__main__':
    main()
