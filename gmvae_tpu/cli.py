"""CLI: ``python -m gmvae_tpu <verb> --config NAME [--set key=value ...]``.

Reference shape (SURVEY.md §1.1): argparse flags selecting dataset/model/
K/latent/epochs; here flags select a named BASELINE config plus typed
``--set`` overrides (SURVEY.md §5.6).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog='gmvae_tpu',
                                description='TPU-native deep mixture VAE')
    sub = p.add_subparsers(dest='verb', required=True)

    def common(sp):
        sp.add_argument('--config', default='mnist_k10',
                        help='named config (see configs.CONFIGS)')
        sp.add_argument('--set', action='append', default=[], metavar='K=V',
                        help='override a config field, e.g. --set steps=1000')
        sp.add_argument('--data-dir', default=None, metavar='DIR',
                        help='directory with local dataset files (npz, '
                             'svhn .mat, celeba jpg layout); default '
                             '$GMVAE_DATA_DIR or ./data_cache')
        sp.add_argument('--debug', action='store_true',
                        help='enable jax_debug_nans (SURVEY.md §5.2)')
        sp.add_argument('--profile', default=None, metavar='LOGDIR',
                        help='jax.profiler trace around the run (§5.1)')

    t = sub.add_parser('train', help='train a config')
    common(t)
    t.add_argument('--resume', action='store_true')
    t.add_argument('--grids', action='store_true',
                   help='save sample/reconstruction PNG grids per eval')

    def ckpt_arg(sp):
        sp.add_argument('--ckpt', default=None, metavar='PATH',
                        help='checkpoint file to restore (default: newest '
                             'ckpt_*.msgpack in the run dir)')

    e = sub.add_parser('eval', help='eval ELBO + clustering from checkpoint')
    common(e)
    ckpt_arg(e)

    s = sub.add_parser('sample', help='generate a sample grid from checkpoint')
    common(s)
    ckpt_arg(s)
    s.add_argument('--n', type=int, default=64)
    s.add_argument('--component', type=int, default=None)
    s.add_argument('--out', default=None)

    r = sub.add_parser('reconstruct',
                       help='reconstruction grid (originals | recons) for '
                            'the first N test images, from checkpoint')
    common(r)
    ckpt_arg(r)
    r.add_argument('--n', type=int, default=32)
    r.add_argument('--out', default=None)

    b = sub.add_parser('bench', help='training throughput benchmark')
    common(b)
    b.add_argument('--steps', type=int, default=2000)
    b.add_argument('--pipeline', choices=('reused', 'windowed'),
                   default='reused',
                   help="input-plan arm: 'reused' re-feeds one chunk's plan "
                        "(the driver contract); 'windowed' drives fit()'s "
                        'real iter_chunk_plans pipeline (benchmark.run_bench)')

    sub.add_parser('configs', help='list the named configs')

    lt = sub.add_parser('latent',
                        help='latent-space scatter plot from checkpoint')
    common(lt)
    ckpt_arg(lt)
    lt.add_argument('--n', type=int, default=2048)
    lt.add_argument('--out', default=None)

    a = sub.add_parser(
        'assign',
        help='batch cluster assignment (the serving verb): images in, '
             'cluster ids + probabilities + latents out')
    common(a)
    ckpt_arg(a)
    a.add_argument('--input', default=None, metavar='NPZ',
                   help="npz with array 'x' (or 'test_x'/first array) of "
                        'uint8 or [0,1]-float images; default: the '
                        "config dataset's test split")
    a.add_argument('--out', default=None, metavar='NPZ',
                   help='write {ids, probs, z} npz; default '
                        '<run_dir>/assignments.npz')
    a.add_argument('--batch', type=int, default=1024)

    x = sub.add_parser(
        'export',
        help='AOT-export an inference verb as a serialized batch-'
             'polymorphic StableHLO artifact (serving.py): trained params '
             'baked in, loadable with jax.export.deserialize alone')
    common(x)
    ckpt_arg(x)
    # dest avoids clobbering the subcommand name in args.verb
    x.add_argument('--verb', dest='verb_x', default='assign',
                   choices=('assign', 'probs', 'latent', 'reconstruct'))
    x.add_argument('--out', default=None, metavar='PATH',
                   help='artifact file; default <run_dir>/<verb>.jaxexport')
    x.add_argument('--platforms', default=None, metavar='P1,P2',
                   help="lowering platforms, e.g. 'tpu' to cross-lower a "
                        'TPU artifact from a CPU host (default: current '
                        'backend)')
    x.add_argument('--dp-batch', type=int, default=None, metavar='N',
                   help='export a DATA-PARALLEL artifact: batch axis '
                        'sharded over the config mesh (fixed batch N '
                        'split across its devices) instead of the '
                        'single-device symbolic-batch default')
    x.add_argument('--quantize', default=None, choices=('int8',),
                   help='weight-only int8 artifact (~4x smaller; '
                        'per-output-channel scales, on-device dequant)')

    d = sub.add_parser(
        'describe',
        help='summarize what a config builds (model family, parameter '
             'counts by submodule, memory envelopes) without training')
    common(d)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.verb == 'configs':   # no jax import needed — instant
        from gmvae_tpu import configs as cfg_lib
        for name in sorted(cfg_lib.CONFIGS):
            c = cfg_lib.get_config(name)
            print(f'{name:16s} dataset={c.dataset:15s} arch={c.arch:7s} '
                  f'K={c.n_components:<3d} D={c.latent_dim:<4d} '
                  f'batch={c.batch_size:<5d} likelihood={c.likelihood}')
        return 0

    # import after arg parsing so --help is instant
    import jax
    from gmvae_tpu import api, configs, training as train_lib
    from gmvae_tpu.utils import checkpoint as ckpt_lib
    from gmvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # repeat invocations skip multi-minute compiles

    if args.debug:
        jax.config.update('jax_debug_nans', True)
    if args.data_dir:
        # loaders read $GMVAE_DATA_DIR; a flag beats env plumbing in docs
        os.environ['GMVAE_DATA_DIR'] = args.data_dir

    try:
        cfg = configs.get_config(args.config,
                                 **configs.parse_overrides(args.set))
    except (KeyError, ValueError) as e:
        print(f'error: {e.args[0] if e.args else e}', file=sys.stderr)
        return 2

    profile_cm = None
    if args.profile:
        profile_cm = jax.profiler.trace(args.profile)
        profile_cm.__enter__()

    try:
        if args.verb == 'describe':
            import numpy as np
            from gmvae_tpu.models.gmvae import init_params
            from gmvae_tpu.ops.elbo import mixture_elbo_head
            model = train_lib.make_model(cfg)
            params = init_params(model, jax.random.PRNGKey(0))
            by_module = {
                k: int(sum(int(np.prod(l.shape))
                           for l in jax.tree.leaves(v)))
                for k, v in sorted(params.items())}
            total = sum(by_module.values())
            mom_bytes = 2 if cfg.opt_state_dtype == 'bfloat16' else 4
            img_bytes = int(np.prod(cfg.image_shape))
            print(json.dumps({
                'config': cfg.name, 'model_family': cfg.model_family,
                'arch': cfg.arch, 'dataset': cfg.dataset,
                'image_shape': list(cfg.image_shape),
                'K': cfg.n_components, 'latent_dim': cfg.latent_dim,
                'likelihood': cfg.likelihood, 'batch_size': cfg.batch_size,
                'steps': cfg.steps,
                'params_total': total, 'params_by_module': by_module,
                'param_bytes_f32': total * 4,
                'adam_moment_bytes': total * 2 * mom_bytes,
                'opt_state_dtype': cfg.opt_state_dtype,
                'batch_staging_bytes_per_chunk':
                    cfg.scan_steps * cfg.batch_size * img_bytes,
                # what make_model ACTUALLY built (cfg.fused alone would
                # claim the Pallas head on hosts where it isn't supported)
                'fused_head': (getattr(model, 'head_fn', mixture_elbo_head)
                               is not mixture_elbo_head),
                'fused_noise': cfg.fused_noise,
                'data_placement': cfg.data_placement,
                'data_sharding': cfg.data_sharding,
            }))
        elif args.verb == 'train':
            _, state, history = api.train(cfg, resume=args.resume,
                                          save_grids=args.grids)
            if history:
                print(json.dumps(history[-1]))
        elif args.verb in ('eval', 'sample', 'reconstruct', 'latent',
                           'assign', 'export'):
            if args.verb == 'export':
                # export touches only model/mesh/params — a stub dataset
                # skips loading (and device-replicating) the training set,
                # which matters on small CPU build hosts cross-lowering
                # TPU artifacts for a celeba-scale config
                from gmvae_tpu import data as data_lib
                trainer = train_lib.Trainer(
                    cfg, data_lib.make_synthetic(
                        image_shape=cfg.image_shape, n_train=8, n_test=8))
            else:
                trainer = train_lib.Trainer(cfg)
            state = trainer.init_state()
            run_dir = os.path.join(cfg.run_dir, cfg.name)
            path = getattr(args, 'ckpt', None) or ckpt_lib.latest_ckpt(run_dir)
            if path and not os.path.exists(path):
                print(f'error: checkpoint {path!r} not found', file=sys.stderr)
                return 2
            if path:
                tree = ckpt_lib.restore_ckpt(path,
                                             trainer.state_to_tree(state))
                state = trainer.tree_to_state(tree)
                print(f'[gmvae] restored {path}', file=sys.stderr)
            else:
                print('[gmvae] WARNING: no checkpoint found; using init '
                      'params', file=sys.stderr)
            if args.verb == 'eval':
                print(json.dumps(api.eval_elbo(trainer, state)))
            elif args.verb == 'export':
                from gmvae_tpu import serving
                out = args.out or os.path.join(run_dir,
                                               f'{args.verb_x}.jaxexport')
                platforms = (args.platforms.split(',')
                             if args.platforms else None)
                blob = serving.export_verb(trainer, state, args.verb_x,
                                           platforms=platforms, path=out,
                                           dp_batch=args.dp_batch,
                                           quantize=args.quantize)
                print(json.dumps({'verb': args.verb_x, 'out': out,
                                  'bytes': len(blob),
                                  'platforms': platforms or 'default',
                                  'dp_batch': args.dp_batch,
                                  'quantize': args.quantize}))
            elif args.verb == 'assign':
                import numpy as np
                if args.input:
                    with np.load(args.input) as z:
                        key = ('x' if 'x' in z else 'test_x'
                               if 'test_x' in z else z.files[0])
                        xs = z[key]
                else:
                    xs = trainer.dataset.test_x
                # ids are argmax of the probs latent_embed already
                # returns — one device sweep, not two
                zlat, probs = api.latent_embed(trainer, state, xs,
                                               batch_size=args.batch)
                ids = probs.argmax(-1).astype(np.int32)
                out = args.out or os.path.join(run_dir, 'assignments.npz')
                # multi-host: every process computed (global arrays);
                # only process 0 writes the shared-path output
                if jax.process_index() == 0:
                    os.makedirs(os.path.dirname(os.path.abspath(out)),
                                exist_ok=True)
                    np.savez(out, ids=ids,
                             probs=probs.astype(np.float32),
                             z=zlat.astype(np.float32))
                    counts = np.bincount(
                        ids, minlength=cfg.n_components).tolist()
                    print(json.dumps({'n': int(len(ids)), 'out': out,
                                      'cluster_counts': counts}))
            elif args.verb == 'latent':
                from gmvae_tpu.utils.logging import save_latent_plot
                if args.n <= 0:
                    print('error: --n must be positive', file=sys.stderr)
                    return 2
                n = min(args.n, len(trainer.dataset.test_x))
                z, _ = api.latent_embed(trainer, state,
                                        trainer.dataset.test_x[:n])
                out = args.out or os.path.join(run_dir, 'latent_cli.png')
                if jax.process_index() != 0:
                    pass  # compute ran everywhere; process 0 writes
                elif save_latent_plot(out, z, trainer.dataset.test_y[:n]):
                    print(out)
                else:
                    print('error: matplotlib unavailable', file=sys.stderr)
                    return 3
            elif args.verb == 'reconstruct':
                import numpy as np

                from gmvae_tpu.utils.logging import save_image_grid
                if args.n <= 0:
                    print('error: --n must be positive', file=sys.stderr)
                    return 2
                n = min(args.n, len(trainer.dataset.test_x))
                orig = trainer.dataset.test_x[:n]
                recon = api.reconstruct(trainer, state, orig)
                # interleave rows: originals above their reconstructions
                grid = np.concatenate(
                    [np.asarray(orig, np.float32) / 255.0,
                     np.asarray(recon, np.float32)], axis=0)
                out = args.out or os.path.join(run_dir, 'recon_cli.png')
                if jax.process_index() == 0:
                    save_image_grid(out, grid, ncol=n)  # orig row, recon row
                    print(out)
            else:
                from gmvae_tpu.utils.logging import save_image_grid
                if args.n <= 0:
                    print('error: --n must be positive', file=sys.stderr)
                    return 2
                imgs = api.sample(trainer, state, args.n,
                                  component=args.component)
                out = args.out or os.path.join(run_dir, 'samples_cli.png')
                if jax.process_index() == 0:
                    save_image_grid(out, imgs)
                    print(out)
        elif args.verb == 'bench':
            from gmvae_tpu.benchmark import run_bench
            # --set steps must win over the harness default (run_bench
            # replaces cfg.steps with its own parameter); scan_steps needs
            # no special case — cfg already carries the --set override and
            # run_bench drives cfg.scan_steps when the arg is unset
            ov = configs.parse_overrides(args.set)
            kw = {'steps': ov.get('steps', args.steps),
                  'pipeline': args.pipeline}
            print(json.dumps(run_bench(cfg, **kw)))
    finally:
        if profile_cm is not None:
            profile_cm.__exit__(None, None, None)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
