"""Build local npz dataset caches for gmvae_tpu (run where network exists).

The training environment may have no egress; loaders then fall back to a
deterministic synthetic stand-in (gmvae_tpu/data/loaders.py). Run this tool
once on a connected machine and ship the npz files:

    python tools/fetch_datasets.py --out data_cache [--datasets mnist fmnist cifar10]

Each ``<name>.npz`` holds train_x/train_y/test_x/test_y (uint8 images
[N,H,W,C] or [N,H,W], int labels) — the exact schema ``data.load`` reads.
SVHN/CelebA have no keras loader; point --svhn-mat / --celeba-dir at the
standard distribution files to convert them.

NOTE: conversion is now OPTIONAL — ``data.load`` reads the standard
distribution formats directly from ``--data-dir`` (mnist/fmnist idx[.gz],
SVHN ``*_32x32.mat``, the CelebA aligned-JPEG layout). This tool remains
for building compact single-file npz caches to ship around.
"""

from __future__ import annotations

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


KERAS_NAMES = ('mnist', 'fmnist', 'cifar10')


def fetch_keras(name: str, out_dir: str) -> str:
    if name not in KERAS_NAMES:
        raise SystemExit(
            f'--datasets accepts {KERAS_NAMES} (keras-downloadable); '
            f'{name!r} is not one — SVHN needs --svhn-mat and CelebA '
            f'needs --celeba-dir (see module docstring)')
    import tensorflow as tf
    mods = {'mnist': tf.keras.datasets.mnist,
            'fmnist': tf.keras.datasets.fashion_mnist,
            'cifar10': tf.keras.datasets.cifar10}
    (tx, ty), (ex, ey) = mods[name].load_data()
    path = os.path.join(out_dir, f'{name}.npz')
    np.savez_compressed(path, train_x=tx.astype(np.uint8),
                        train_y=np.asarray(ty, np.int32).ravel(),
                        test_x=ex.astype(np.uint8),
                        test_y=np.asarray(ey, np.int32).ravel())
    return path


def convert_svhn(mat_train: str, mat_test: str, out_dir: str) -> str:
    from scipy.io import loadmat
    def load(p):
        m = loadmat(p)
        x = np.transpose(m['X'], (3, 0, 1, 2)).astype(np.uint8)  # N,H,W,C
        y = m['y'].ravel().astype(np.int32) % 10                  # '10'->0
        return x, y
    tx, ty = load(mat_train)
    ex, ey = load(mat_test)
    path = os.path.join(out_dir, 'svhn.npz')
    np.savez_compressed(path, train_x=tx, train_y=ty, test_x=ex, test_y=ey)
    return path


def convert_celeba(celeba_root: str, out_dir: str) -> str:
    """Build celeba.npz via the CANONICAL loader pipeline.

    ``celeba_root`` is the standard distribution layout: an
    ``img_align_celeba/`` directory plus the official sidecars
    (``list_eval_partition.txt`` split, ``list_attr_celeba.txt`` labels).
    Delegating to ``data.loaders._from_celeba_dir`` guarantees this
    tool's cache is byte-identical to what a training run would build
    itself — a previous hand-rolled converter here produced different
    labels (binary first-attribute vs the 32-class attribute code),
    a different split (last-10k vs the official partition), and a
    different resample filter, silently changing BASELINE rows
    depending on which path built the cache.
    """
    from gmvae_tpu.data import loaders
    ds = loaders._from_celeba_dir(celeba_root)
    if ds is None:
        raise SystemExit(
            f'{celeba_root!r} does not contain the standard CelebA '
            f'layout (img_align_celeba/ + sidecar txt files)')
    src = os.path.join(celeba_root, 'celeba.npz')  # the loader's cache
    dst = os.path.join(out_dir, 'celeba.npz')
    if os.path.abspath(src) != os.path.abspath(dst):
        if os.path.exists(src):
            import shutil
            shutil.copy2(src, dst)
        else:  # loader could not write its cache (read-only root)
            np.savez_compressed(dst, train_x=ds.train_x,
                                train_y=ds.train_y, test_x=ds.test_x,
                                test_y=ds.test_y)
    return dst


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='data_cache')
    p.add_argument('--datasets', nargs='*',
                   default=['mnist', 'fmnist', 'cifar10'])
    p.add_argument('--svhn-mat', nargs=2, metavar=('TRAIN', 'TEST'))
    p.add_argument('--celeba-dir', metavar='CELEBA_ROOT',
                   help='standard CelebA layout (img_align_celeba/ + '
                        'official sidecar txt files)')
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in args.datasets:
        print('wrote', fetch_keras(name, args.out))
    if args.svhn_mat:
        print('wrote', convert_svhn(*args.svhn_mat, args.out))
    if args.celeba_dir:
        print('wrote', convert_celeba(args.celeba_dir, args.out))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
