"""Host-side dataset fetch (runs once, outside the hot loop)."""

from __future__ import annotations

import os
import warnings
import zlib
from typing import NamedTuple, Optional

import numpy as np


class Dataset(NamedTuple):
    """Raw host arrays: images uint8 [N,H,W,C] in [0,255], labels int32 [N].

    Labels are for EVALUATION ONLY (clustering ACC/NMI) — training is fully
    unsupervised. ``synthetic`` is True when a fallback replaced real data.
    ``source`` records provenance as ``<loader-kind>:<path-or-seed>`` (e.g.
    ``npz:/data/mnist.npz``, ``synthetic:seed=77``) so acceptance outputs
    are self-describing about what data actually backed each row.
    """
    name: str
    train_x: np.ndarray
    train_y: np.ndarray
    test_x: np.ndarray
    test_y: np.ndarray
    synthetic: bool = False
    source: str = ''


_SHAPES = {
    'mnist': (28, 28, 1),
    'fmnist': (28, 28, 1),
    'svhn': (32, 32, 3),
    'cifar10': (32, 32, 3),
    'celeba': (64, 64, 3),
}
_N_CLASSES = {'mnist': 10, 'fmnist': 10, 'svhn': 10, 'cifar10': 10,
              'celeba': 40}


def _ensure_nhwc(x: np.ndarray, shape) -> np.ndarray:
    x = np.asarray(x)
    if x.ndim == 3:
        x = x[..., None]
    assert x.shape[1:] == tuple(shape), (x.shape, shape)
    if np.issubdtype(x.dtype, np.floating):
        # float exports come in [0,1] (normalized) or [0,255]; a blind
        # uint8 cast would truncate the former to all-zeros and train on
        # black images without any error. The boundary is ambiguous for
        # max in (1, 2]: a genuinely-[0,255] export never peaks that low,
        # while a [0,1] export can overshoot slightly (augmentation /
        # normalization) — treating it as [0,255] would quantize the whole
        # dataset to near-black. So (1, 2] counts as [0,1]-with-overshoot,
        # loudly.
        mx = float(x.max(initial=0.0))
        scale = 255.0 if mx <= 2.0 else 1.0
        if 1.0 + 1e-6 < mx <= 2.0:
            warnings.warn(
                f'float dataset max {mx:.4g} is ambiguous between [0,1] '
                f'and [0,255]; treating as [0,1] with overshoot (values '
                f'clipped to 1.0) — pass uint8 or a clean range to '
                f'silence this')
        x = np.clip(np.rint(x * scale), 0, 255)
        if scale == 1.0 and float(x.mean()) < 1.0:
            warnings.warn(
                f'float dataset inferred as [0,255] (max {mx:.4g}) but '
                f'quantizes to a near-black uint8 image set (mean '
                f'{float(x.mean()):.3g}/255) — if the source was '
                f'[0,1]-normalized, rescale it before loading')
    return x.astype(np.uint8)


def _from_npz(name: str, data_dir: str) -> Optional[Dataset]:
    path = os.path.join(data_dir, f'{name}.npz')
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return Dataset(
            name=name,
            train_x=_ensure_nhwc(z['train_x'], _SHAPES[name]),
            train_y=z['train_y'].astype(np.int32).ravel(),
            test_x=_ensure_nhwc(z['test_x'], _SHAPES[name]),
            test_y=z['test_y'].astype(np.int32).ravel(),
            source=f'npz:{path}',
        )


def _from_svhn_mat(data_dir: str) -> Optional[Dataset]:
    """First-class SVHN loader: reads the standard distribution files
    (train_32x32.mat / test_32x32.mat, as published at
    ufldl.stanford.edu/housenumbers) straight from ``data_dir`` — no
    conversion step. Accepts the ``svhn_``-prefixed names too."""
    def find(kind):
        for fname in (f'{kind}_32x32.mat', f'svhn_{kind}_32x32.mat'):
            p = os.path.join(data_dir, fname)
            if os.path.exists(p):
                return p
        return None

    train_p, test_p = find('train'), find('test')
    if not (train_p and test_p):
        return None
    from scipy.io import loadmat

    def load(p):
        m = loadmat(p)
        x = np.transpose(m['X'], (3, 0, 1, 2)).astype(np.uint8)  # N,H,W,C
        y = m['y'].ravel().astype(np.int32) % 10                 # '10' -> 0
        return x, y

    tx, ty = load(train_p)
    ex, ey = load(test_p)
    return Dataset(name='svhn', source=f'svhn_mat:{train_p}',
                   train_x=_ensure_nhwc(tx, _SHAPES['svhn']),
                   train_y=ty, test_x=_ensure_nhwc(ex, _SHAPES['svhn']),
                   test_y=ey)


def _from_idx(name: str, data_dir: str) -> Optional[Dataset]:
    """First-class MNIST/Fashion-MNIST loader: the standard idx distribution
    files (train-images-idx3-ubyte / train-labels-idx1-ubyte / t10k-...,
    optionally .gz, as published at yann.lecun.com and by Zalando) straight
    from ``data_dir`` — no conversion step."""
    import gzip
    import struct

    def find(stem):
        # dataset-prefixed names FIRST: mnist and fmnist are published
        # under identical bare filenames, so an explicit `fmnist_` prefix
        # must win over a bare (possibly other-dataset) file beside it
        for fname in (f'{name}_{stem}', f'{name}_{stem}.gz',
                      stem, stem + '.gz'):
            p = os.path.join(data_dir, fname)
            if os.path.exists(p):
                if not fname.startswith(f'{name}_'):
                    # mnist and fmnist idx files are shape-identical, so a
                    # bare file could silently be the OTHER dataset
                    warnings.warn(
                        f'loading un-prefixed idx file {p!r} for dataset '
                        f'{name!r}; rename it {name}_{fname} to silence '
                        f'this (bare mnist/fmnist files are '
                        f'indistinguishable by shape)', stacklevel=4)
                return p
        return None

    paths = {kind: (find(f'{prefix}-images-idx3-ubyte'),
                    find(f'{prefix}-labels-idx1-ubyte'))
             for kind, prefix in (('train', 'train'), ('test', 't10k'))}
    if any(p is None for pair in paths.values() for p in pair):
        return None

    def read(path):
        op = gzip.open if path.endswith('.gz') else open
        with op(path, 'rb') as f:
            magic, n = struct.unpack('>II', f.read(8))
            if magic == 2051:                      # images
                h, w = struct.unpack('>II', f.read(8))
                data = np.frombuffer(f.read(n * h * w), np.uint8)
                return data.reshape(n, h, w, 1)
            if magic == 2049:                      # labels
                return np.frombuffer(f.read(n), np.uint8).astype(np.int32)
            raise ValueError(f'{path}: not an idx file (magic {magic})')

    tx, ty = read(paths['train'][0]), read(paths['train'][1])
    ex, ey = read(paths['test'][0]), read(paths['test'][1])
    return Dataset(name=name, source=f'idx:{paths["train"][0]}',
                   train_x=_ensure_nhwc(tx, _SHAPES[name]),
                   train_y=ty, test_x=_ensure_nhwc(ex, _SHAPES[name]),
                   test_y=ey)


# CelebA evaluation-label semantics: Hungarian ACC matches K clusters to
# label classes, so labels must have <= K (=64, configs.celeba_dp16)
# classes to be meaningful — the ~10k-class identity labeling would make
# ACC structurally vacuous. The label is therefore built from these five
# binary attributes of the official ``list_attr_celeba.txt`` sidecar
# (2^5 = 32 classes), chosen for visual salience (they move pixels a VAE
# can see): label = sum_i 2^i * [attr_i positive].
CELEBA_LABEL_ATTRS = ('Male', 'Smiling', 'Eyeglasses', 'Wearing_Hat',
                      'Blond_Hair')


def _wait_for_sibling_npz(data_dir: str, timeout_s: float = 1800.0
                          ) -> Optional[Dataset]:
    """Multi-process: non-zero processes wait for process 0's celeba.npz
    cache instead of each decoding all ~200k JPEGs concurrently."""
    import time
    path = os.path.join(data_dir, 'celeba.npz')
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if os.path.exists(path):
            return _from_npz('celeba', data_dir)
        time.sleep(2.0)
    raise TimeoutError(
        f'process waited {timeout_s:.0f}s for {path} (written by process 0 '
        f'after its JPEG decode) — pre-build the cache with '
        f'tools/fetch_datasets.py if the decode exceeds this')


def _celeba_labels(attr_path: Optional[str],
                   ident_path: Optional[str]) -> dict:
    """filename -> eval label. Prefers the 32-class attribute code
    (CELEBA_LABEL_ATTRS) from list_attr_celeba.txt; falls back to remapped
    identities (warned: vacuous for Hungarian ACC at K=64), else {}."""
    if attr_path:
        with open(attr_path) as f:
            lines = f.read().splitlines()
        # official format: line 1 = count, line 2 = attribute names header
        for hdr_i, line in enumerate(lines[:3]):
            cols = line.split()
            if all(a in cols for a in CELEBA_LABEL_ATTRS):
                bit_cols = [cols.index(a) for a in CELEBA_LABEL_ATTRS]
                labels = {}
                for line in lines[hdr_i + 1:]:
                    parts = line.split()
                    # header lacks the filename column -> attrs are parts[1:]
                    if len(parts) == len(cols) + 1:
                        labels[parts[0]] = sum(
                            (parts[1 + c] == '1') << i
                            for i, c in enumerate(bit_cols))
                if labels:
                    return labels
        warnings.warn(
            f'{attr_path!r} missing attributes {CELEBA_LABEL_ATTRS}; '
            f'falling back to identity labels', stacklevel=3)
    if ident_path:
        warnings.warn(
            'celeba labels from identity_CelebA.txt (~10k classes): '
            'Hungarian ACC against K=64 clusters is structurally vacuous — '
            'provide list_attr_celeba.txt for the 32-class attribute '
            'labeling', stacklevel=3)
        identity = {}
        with open(ident_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    identity[parts[0]] = int(parts[1])
        remap = {v: i for i, v in enumerate(sorted(set(identity.values())))}
        return {k: remap[v] for k, v in identity.items()}
    return {}


def _from_celeba_dir(data_dir: str) -> Optional[Dataset]:
    """First-class CelebA loader: reads the standard aligned-JPEG
    distribution (``img_align_celeba/*.jpg``, 178x218, as published on the
    CelebA site / kaggle mirror) straight from ``data_dir`` — no conversion
    step. Preprocessing is the common VAE recipe: center-crop 148x148, then
    bilinear resize to 64x64.

    Host-memory envelope: the full 202,599-image decode holds one uint8
    [N,64,64,3] tensor ≈ 2.5 GB (plus one decoded JPEG per worker thread);
    the npz cache compresses to ~1.9 GB on disk.

    Optional sidecar files, used when present:
      - ``list_eval_partition.txt`` (filename 0|1|2): 0/1 -> train, 2 -> test
        (the official split; val folds into train as the reference-style
        trainers do). Absent: last 10% of filenames (sorted) become test.
      - ``list_attr_celeba.txt``: EVALUATION-ONLY labels from the 5 binary
        attributes in ``CELEBA_LABEL_ATTRS`` (32 classes <= K=64 — see the
        comment above; identity labels would make Hungarian ACC vacuous).
        Absent: falls back to ``identity_CelebA.txt`` remapped to contiguous
        ints (with a warning — ACC is then meaningless at ~10k classes),
        else labels are all zero (training is unsupervised either way).

    The decoded uint8 tensor is cached as ``celeba.npz`` in ``data_dir`` so
    the JPEG decode (~200k images) happens once; later loads hit _from_npz.
    Multi-process runs decode on process 0 only — other processes block on
    the cache file appearing.
    """
    for root in (os.path.join(data_dir, 'img_align_celeba'),
                 os.path.join(data_dir, 'celeba', 'img_align_celeba')):
        if os.path.isdir(root):
            break
    else:
        return None
    names = sorted(f for f in os.listdir(root)
                   if f.lower().endswith(('.jpg', '.jpeg', '.png')))
    if not names:
        return None

    # duplicate-work guard (jax.distributed multi-host): only process 0
    # decodes + writes the cache. Lazy import: jax may legitimately be
    # uninitialized in offline tools; treat that as single-process.
    try:
        import jax
        multi = jax.process_count() > 1
        is_zero = jax.process_index() == 0
    except Exception:
        multi, is_zero = False, True
    if multi and not is_zero:
        return _wait_for_sibling_npz(data_dir)

    from PIL import Image

    side = os.path.dirname(root)

    def sidecar(fname):
        for d in (side, data_dir):
            p = os.path.join(d, fname)
            if os.path.exists(p):
                return p
        return None

    part_p = sidecar('list_eval_partition.txt')
    partition = {}
    if part_p:
        with open(part_p) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2 and parts[1] in ('0', '1', '2'):
                    partition[parts[0]] = int(parts[1])

    labels = _celeba_labels(sidecar('list_attr_celeba.txt'),
                            sidecar('identity_CelebA.txt'))

    h, w, _ = _SHAPES['celeba']
    xs = np.empty((len(names), h, w, 3), np.uint8)
    ys = np.zeros((len(names),), np.int32)
    is_test = np.zeros((len(names),), bool)
    n_fallback_test = max(1, len(names) // 10)

    def decode(i_fname):
        i, fname = i_fname
        with Image.open(os.path.join(root, fname)) as im:
            im = im.convert('RGB')
            cw, ch = im.size
            left, top = (cw - 148) // 2, (ch - 148) // 2
            im = im.crop((left, top, left + 148, top + 148))
            xs[i] = np.asarray(im.resize((w, h), Image.BILINEAR), np.uint8)

    # thread pool: libjpeg decode releases the GIL, and each thread writes
    # a disjoint xs row — ~200k images drop from minutes to tens of seconds
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(32, os.cpu_count() or 1)) as ex:
        list(ex.map(decode, enumerate(names), chunksize=256))
    for i, fname in enumerate(names):
        ys[i] = labels.get(fname, 0)
        is_test[i] = (partition[fname] == 2 if fname in partition
                      else i >= len(names) - n_fallback_test)

    ds = Dataset(name='celeba', source=f'celeba_dir:{root}',
                 train_x=xs[~is_test], train_y=ys[~is_test],
                 test_x=xs[is_test], test_y=ys[is_test])
    try:
        # write-tmp-rename: a kill mid-write must not leave a truncated
        # celeba.npz that _from_npz would pick up (and crash on) forever
        final = os.path.join(data_dir, 'celeba.npz')
        tmp = final + '.tmp.npz'   # np.savez appends .npz to other suffixes
        np.savez_compressed(tmp, train_x=ds.train_x, train_y=ds.train_y,
                            test_x=ds.test_x, test_y=ds.test_y)
        os.replace(tmp, final)
    except OSError:
        # single-process: cache is best-effort (read-only data_dir is
        # fine). Multi-process: siblings BLOCK on this file appearing
        # (_wait_for_sibling_npz) — failing fast here beats every other
        # process timing out after 30 idle minutes.
        import jax
        if jax.process_count() > 1:
            raise OSError(
                f'process 0 could not write the celeba cache in '
                f'{data_dir!r}, which the other {jax.process_count() - 1} '
                f'processes are waiting on — make data_dir writable or '
                f'pre-build the cache with tools/fetch_datasets.py')
    return ds


def _from_keras(name: str) -> Optional[Dataset]:
    """tf.keras.datasets loader — hits the local keras cache, downloads only
    when the environment has egress (this one does not; errors are caught)."""
    if name not in ('mnist', 'fmnist', 'cifar10'):
        return None  # svhn/celeba have no keras loader; skip the tf import
    try:
        import contextlib
        import io

        import tensorflow as tf  # noqa: PLC0415 — heavyweight, import lazily
        mods = {'mnist': tf.keras.datasets.mnist,
                'fmnist': tf.keras.datasets.fashion_mnist,
                'cifar10': tf.keras.datasets.cifar10}
        # keras prints download progress to STDOUT; keep stdout pure (the
        # bench harness contract is exactly one JSON line on stdout)
        with contextlib.redirect_stdout(io.StringIO()):
            (tx, ty), (ex, ey) = mods[name].load_data()
        return Dataset(
            name=name,
            train_x=_ensure_nhwc(tx, _SHAPES[name]),
            train_y=np.asarray(ty).astype(np.int32).ravel(),
            test_x=_ensure_nhwc(ex, _SHAPES[name]),
            test_y=np.asarray(ey).astype(np.int32).ravel(),
            source=f'keras:{name}',
        )
    except Exception:
        return None


def make_synthetic(image_shape=(8, 8, 1), n_clusters: int = 2,
                   n_train: int = 4096, n_test: int = 1024,
                   seed: int = 0, name: str = 'synthetic',
                   separation: float = 1.0,
                   noise_std: float = 0.08) -> Dataset:
    """Deterministic planted-cluster image dataset (SURVEY.md §4.2).

    Each cluster has a smooth random prototype image; samples are the
    prototype plus pixel noise, quantized to uint8. At the defaults
    (``separation=1``) clusters are saturated and trivially separable —
    the integration tests demand ACC > 0.95 on it. Lower ``separation``
    (prototype contrast scale) and higher ``noise_std`` overlap the
    clusters so quality metrics are NOT ceiling-saturated: the
    'synthetic_hard' benchmark fixture uses this to guard clustering
    regressions a 1.00-ACC fixture cannot see.
    """
    rng = np.random.default_rng(seed)
    h, w, c = image_shape
    # smooth prototypes: low-frequency random fields
    protos = []
    for k in range(n_clusters):
        low = rng.uniform(0, 1, size=(max(2, h // 4), max(2, w // 4), c))
        up = np.kron(low, np.ones((h // low.shape[0] + 1,
                                   w // low.shape[1] + 1, 1)))[:h, :w, :]
        bits = (up > 0.5).astype(np.float64)
        if separation == 1.0:
            # keep the EXACT round-1 formula (bit-stable stand-ins)
            proto = bits * 0.85 + 0.075
        else:
            proto = 0.5 + (bits - 0.5) * 0.85 * separation
        protos.append(proto)
    protos = np.stack(protos)  # [K, H, W, C]

    def draw(n, rng):
        ys = rng.integers(0, n_clusters, size=n)
        noise = rng.normal(0, noise_std, size=(n, h, w, c))
        xs = np.clip(protos[ys] + noise, 0, 1)
        return (xs * 255).astype(np.uint8), ys.astype(np.int32)

    train_x, train_y = draw(n_train, rng)
    test_x, test_y = draw(n_test, rng)
    return Dataset(name=name, train_x=train_x, train_y=train_y,
                   test_x=test_x, test_y=test_y, synthetic=True,
                   source=f'synthetic:seed={seed}')


def make_synthetic_hard(seed: int = 77) -> Dataset:
    """MNIST-shaped overlapping-cluster benchmark fixture.

    Deliberately NOT ceiling-saturated: prototypes at 25% contrast with 3x
    the pixel noise. Calibration measured on v5e (10k-step runs of the
    mnist-architecture config, BASELINE.md r2): at separation 0.08 the
    fixture is information-rich (true-centroid classifier: 0.97 ACC) but
    every trained GMVAE variant collapses to ~0.11 — too hard to serve as
    a regression guard; at 0.4 the model clusters at 0.87-1.00 — nearly
    saturated. 0.25 lands training mid-range (ACC ~0.5, NMI ~0.65) where
    quality regressions are visible in BOTH directions. Parameters frozen —
    changing them invalidates the recorded baseline row and the golden
    trajectory."""
    return make_synthetic(image_shape=(28, 28, 1), n_clusters=10,
                          n_train=60_000, n_test=10_000, seed=seed,
                          name='synthetic_hard',
                          separation=0.25, noise_std=0.25)


def load(name: str, data_dir: Optional[str] = None,
         allow_synthetic_fallback: bool = True,
         image_shape: Optional[tuple] = None) -> Dataset:
    """Load a dataset by BASELINE config name (mnist|fmnist|svhn|cifar10|
    celeba|synthetic|synthetic_hard), trying local npz -> keras cache ->
    synthetic.

    ``image_shape`` parameterizes only the 'synthetic' dataset (so a
    config with a non-default shape — e.g. a 3-channel conv test config —
    gets matching data); real datasets and the frozen 'synthetic_hard'
    fixture have fixed shapes and ignore it.
    """
    if name == 'synthetic':
        return make_synthetic(image_shape=image_shape or (8, 8, 1))
    if name == 'synthetic_hard':
        return make_synthetic_hard()
    if name not in _SHAPES:
        raise KeyError(f'unknown dataset {name!r}')

    data_dir = data_dir or os.environ.get('GMVAE_DATA_DIR', 'data_cache')
    ds = _from_npz(name, data_dir)
    if ds is None and name in ('mnist', 'fmnist'):
        ds = _from_idx(name, data_dir)
    if ds is None and name == 'svhn':
        ds = _from_svhn_mat(data_dir)
    if ds is None and name == 'celeba':
        ds = _from_celeba_dir(data_dir)
    if ds is None:
        ds = _from_keras(name)
    if ds is not None:
        return ds
    if not allow_synthetic_fallback:
        raise FileNotFoundError(
            f'dataset {name!r} not found in {data_dir!r} and no network')
    warnings.warn(
        f'dataset {name!r} unavailable (no local cache, no network); '
        f'substituting a deterministic synthetic stand-in of the same shape',
        stacklevel=2)
    shape = _SHAPES[name]
    # crc32, NOT hash(): Python string hashing is salted per interpreter,
    # which would give every process a different stand-in — silently breaking
    # put_global's identical-host-copies assumption (parallel/mesh.py) and
    # all cross-run reproducibility of BASELINE rows.
    return make_synthetic(image_shape=shape, n_clusters=_N_CLASSES[name],
                          n_train=60_000 if shape[0] == 28 else 50_000,
                          n_test=10_000,
                          seed=zlib.crc32(name.encode()) % (2**31),
                          name=name)
