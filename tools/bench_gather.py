"""Dataset-gather representation microbench (VERDICT r3 #3 follow-through).

The fixed profile_attr accounting showed the flagship's single biggest
step cost is NOT math: the per-step dataset row gather
(``x_all[idx_row]``, training.py:279) runs 33.9 us/step = 36% of the
93.7 us while-envelope, moving ~200 KB at ~6 GB/s. The suspected cause is
layout: u8[N,28,28] tiles to T(8,128)(4,1) — each 784-byte example pads
to a ~4 KB strided tile footprint, and the gather engine pays it per row.

This tool measures candidate representations of the SAME bytes on the
real chip, each inside a jitted lax.scan mirroring the train loop:

- ``u8_img``     u8[N,H,W,C] row gather (production today)
- ``u8_flat``    u8[N,P] flat rows (lane-major, minimal padding)
- ``i32_packed`` int32[N,ceil(P/4)] rows + in-body byte unpack (shifts);
                 the unpack is elementwise VPU work that fuses into the
                 preprocess
- ``f32_flat``   f32[N,P] rows (4x the bytes, natural word width —
                 isolates element-count vs byte-count scaling)
- ``slice_contig`` contiguous dynamic-slice of u8[N,P] (no gather at
                 all: the speed-of-light floor for B rows/step)

Every variant folds an exact u8 checksum into the scan carry — identical
checksums across variants prove the gathered bytes are identical, so a
faster representation is trajectory-preserving by construction.

    python tools/bench_gather.py                # mnist flagship shape
    python tools/bench_gather.py --n 60000 --shape 32,32,3 --batch 256
"""

from __future__ import annotations

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time

import numpy as np


def _checksum(u8):
    import jax.numpy as jnp
    return jnp.sum(u8.astype(jnp.uint32), dtype=jnp.uint32)


def make_variants(n: int, shape: tuple, batch: int, scan_steps: int):
    """Yield (name, x_device_array, jitted_scan_fn(x, idx) -> checksum)."""
    import jax
    import jax.numpy as jnp

    from gmvae_tpu.data import preprocess as pp

    p = int(np.prod(shape))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(n, p), dtype=np.uint8)

    def scanner(gather_row):
        def fn(x, idx):
            def body(acc, idx_row):
                return acc + _checksum(gather_row(x, idx_row)), ()
            acc, _ = jax.lax.scan(body, jnp.uint32(0), idx)
            return acc
        return jax.jit(fn)

    yield ('u8_img', jnp.asarray(base.reshape(n, *shape)),
           scanner(lambda x, r: x[r]))
    yield ('u8_flat', jnp.asarray(base), scanner(lambda x, r: x[r]))
    packed = pp.pack_rows(base.reshape(n, *shape))
    yield ('i32_packed', jnp.asarray(packed),
           scanner(lambda x, r: pp.unpack_rows(x[r], shape)))
    yield ('f32_flat', jnp.asarray(base, dtype=jnp.float32),
           scanner(lambda x, r: x[r].astype(jnp.uint8)))

    def contig(x, r):
        # ignores the plan: B contiguous rows from a moving offset — the
        # no-gather floor, NOT a drop-in (batch composition differs)
        return jax.lax.dynamic_slice_in_dim(x, r[0] % (n - batch), batch)
    yield ('slice_contig', jnp.asarray(base), scanner(contig))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=60_000)
    ap.add_argument('--shape', default='28,28,1')
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--scan-steps', type=int, default=100)
    ap.add_argument('--repeats', type=int, default=30)
    args = ap.parse_args(argv)
    shape = tuple(int(s) for s in args.shape.split(','))

    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, args.n,
                                   size=(args.scan_steps, args.batch),
                                   dtype=np.int32))
    p = int(np.prod(shape))
    rows = args.scan_steps * args.batch
    sums = {}
    for name, x, fn in make_variants(args.n, shape, args.batch,
                                     args.scan_steps):
        acc = int(np.asarray(fn(x, idx)))           # compile + fence
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = fn(x, idx)
        acc = int(np.asarray(out))                  # scalar fetch = fence
        dt = (time.perf_counter() - t0) / args.repeats
        sums[name] = acc
        print(json.dumps({
            'variant': name,
            'us_per_step': round(1e6 * dt / args.scan_steps, 2),
            'ns_per_row': round(1e9 * dt / rows, 1),
            'gbps_logical': round(rows * p / dt / 1e9, 2),
            'checksum': acc,
        }), flush=True)
    gathers = {k: v for k, v in sums.items() if k != 'slice_contig'}
    if len(set(gathers.values())) != 1:
        print(json.dumps({'error': 'checksum mismatch', 'sums': sums}),
              flush=True)
        sys.exit(1)
    print(json.dumps({'checksums_identical': True,
                      'variants': sorted(gathers)}), flush=True)


if __name__ == '__main__':
    main()
