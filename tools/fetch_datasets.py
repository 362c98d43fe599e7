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

import argparse
import os

import numpy as np


def fetch_keras(name: str, out_dir: str) -> str:
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


def convert_celeba(img_dir: str, attr_file: str, out_dir: str,
                   size: int = 64, n_test: int = 10_000) -> str:
    """Center-crop to 148, resize to ``size``; label = first attribute."""
    from PIL import Image
    names = sorted(os.listdir(img_dir))
    attrs = {}
    with open(attr_file) as f:
        lines = f.read().strip().splitlines()[2:]
        for ln in lines:
            parts = ln.split()
            attrs[parts[0]] = max(0, int(parts[1]))
    xs, ys = [], []
    for n in names:
        im = Image.open(os.path.join(img_dir, n))
        w, h = im.size
        left, top = (w - 148) // 2, (h - 148) // 2
        im = im.crop((left, top, left + 148, top + 148)).resize((size, size))
        xs.append(np.asarray(im, np.uint8))
        ys.append(attrs.get(n, 0))
    x = np.stack(xs)
    y = np.asarray(ys, np.int32)
    path = os.path.join(out_dir, 'celeba.npz')
    np.savez_compressed(path, train_x=x[:-n_test], train_y=y[:-n_test],
                        test_x=x[-n_test:], test_y=y[-n_test:])
    return path


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='data_cache')
    p.add_argument('--datasets', nargs='*',
                   default=['mnist', 'fmnist', 'cifar10'])
    p.add_argument('--svhn-mat', nargs=2, metavar=('TRAIN', 'TEST'))
    p.add_argument('--celeba-dir', nargs=2, metavar=('IMG_DIR', 'ATTR_FILE'))
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in args.datasets:
        print('wrote', fetch_keras(name, args.out))
    if args.svhn_mat:
        print('wrote', convert_svhn(*args.svhn_mat, args.out))
    if args.celeba_dir:
        print('wrote', convert_celeba(*args.celeba_dir, args.out))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
