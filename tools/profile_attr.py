"""Per-op attribution of the training step from an xplane profile.

VERDICT r3 #3: the flagship step's ~108 us had ~70 us waved off as "fixed
per-op overhead" — this tool replaces that assertion with a measured
table. It traces a STEADY-STATE window (compile excluded: one untraced
warmup chunk first) of a named config's real training loop, then parses
the xplane protobuf into per-op durations aggregated by name, and rolls
them up into named groups (head kernel, enc/dec matmuls, Adam chain,
gather/binarize, collectives, infeed/outfeed, other).

    python tools/profile_attr.py mnist_k10              # capture + attribute
    python tools/profile_attr.py --parse /path/to/dir   # re-read a trace

Output: one JSON line per op group (total device-time share), then a
per-op table (--top N, default 25) on stderr for drill-down. Works on any
backend — on TPU the device planes are '/device:TPU:*'; the CPU fallback
parses the XLA-CPU executor line (used by the fixture test).

Accounting (learned from the first real v5e capture): a TPU op line is
NOT flat — three event kinds would wildly over-count if summed naively:

- **async spans** (categories ``copy-start``/``async-start``): DMA windows
  whose duration runs from issue to completion and OVERLAPS the compute
  executing underneath (the first capture had 339 ms of ``async-copy``
  spans inside 47 ms of actual loop). Reported separately as
  ``async_spans`` (overlapped, not additive).
- **the ``while`` envelope**: the scan loop op spans every op inside it.
  It is the true step envelope — per-step device time = while total /
  steps — and is reported as ``envelope_us_per_step``, never summed with
  its own body.
- **body ops**: everything else; grouped via GROUP_RULES. When an
  envelope exists, group shares are of the envelope and the shortfall
  (envelope − itemized body) is the ``unattributed`` group: inter-op gaps,
  sequencer overhead, and sync waits inside the loop.
"""

from __future__ import annotations

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import json
import os
import sys
import tempfile

# op-name/category -> group rules, first match wins. TPU HLO events carry
# the fused computation's name; jax preserves source function names inside
# fusion display names often enough that these substrings attribute the
# big items (refine against the real trace's leftover 'other' share).
GROUP_RULES = [
    ('head_kernel', ('fused_elbo', 'tpu_custom_call', 'custom-call')),
    ('optimizer', ('adam', 'scale_by', 'update_moment', 'bias_correction',
                   'apply_updates', 'clip_by', 'opt_update')),
    ('collectives', ('all-reduce', 'all-gather', 'reduce-scatter',
                     'collective', 'psum')),
    ('data_gather', ('gather', 'dynamic-slice', 'binarize', 'preprocess',
                     'dynamic-update-slice', 'threefry', 'random_bits',
                     'iota_and_compare')),
    ('matmul', ('dot', 'convolution', 'conv', 'dense')),
    ('infeed_outfeed', ('infeed', 'outfeed', 'host')),
    ('copy_reshape', ('copy', 'transpose', 'reshape', 'bitcast', 'pad')),
    ('loop_fusion', ('fusion', 'loop')),
]


ASYNC_CATS = ('copy-start', 'async-start')
ENVELOPE_CATS = ('while', 'conditional')


def classify(name: str, category: str, provenance: str = '') -> str:
    hay = f'{name} {category} {provenance}'.lower()
    for group, needles in GROUP_RULES:
        if any(n in hay for n in needles):
            return group
    return 'other'


def event_kind(name: str, category: str) -> str:
    """'async' (overlapped DMA span) / 'envelope' (loop op spanning its
    body) / 'body' (real sequential device work)."""
    cat = category.lower()
    if cat in ASYNC_CATS or name.startswith(('async-', 'copy-start')):
        return 'async'
    if cat in ENVELOPE_CATS or name.split('.')[0] in ENVELOPE_CATS:
        return 'envelope'
    return 'body'


def parse_xplane(path: str):
    """Yield (plane, line, op_name, category, total_ps, count) aggregates.

    ``path``: a trace logdir (searched recursively for ``*.xplane.pb``)
    or a single xplane file. Only DEVICE planes count — host/python lines
    would double-book the dispatch time the device view already shows as
    gaps. Off-TPU, the XLA-CPU executor line stands in for the device.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # lazy: heavy

    files = ([path] if path.endswith('.xplane.pb') else
             sorted(glob.glob(os.path.join(path, '**', '*.xplane.pb'),
                              recursive=True)))
    if not files:
        raise SystemExit(f'no *.xplane.pb under {path!r}')
    rows = []
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, 'rb') as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            is_device = plane.name.startswith('/device:')
            # device planes carry several views of the same wall-clock
            # ('XLA Modules' wraps the ops the 'XLA Ops' line itemizes) —
            # take only the op-level line when it exists or shares would
            # double-book
            op_lines = [ln for ln in plane.lines if 'XLA Ops' in ln.name]
            lines = op_lines or plane.lines
            # CPU fallback: the XLA:CPU client line ('tf_XLAPjRtCpuClient/…')
            # carries executed-op events with real durations (the executor /
            # codegen lines are runtime scheduling noise, not op time)
            for line in lines:
                if not (is_device or
                        line.name.startswith('tf_XLAPjRtCpuClient')):
                    continue
                agg = {}
                for ev in line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    name = md.display_name or md.name
                    if name.startswith('end: '):
                        continue  # CPU client emits begin/end event pairs
                    if name.startswith(('ThunkExecutor', 'Rendezvous',
                                        'TaskDispatcher', 'FusionCompiler')):
                        continue  # runtime scheduling frames, not op time
                    cat = prov = long = ''
                    for st in list(ev.stats) + list(md.stats):
                        smd = plane.stat_metadata[st.metadata_id]
                        val = (st.str_value or plane.stat_metadata.get(
                            st.ref_value, xplane_pb2.XStatMetadata()).name)
                        if smd.name in ('hlo_category', 'category',
                                        'equation') and not cat:
                            cat = val
                        # jax scoped op names ('jit(chunk)/.../adam/...')
                        # ride the tf_op/source stats on TPU — the only
                        # signal that splits e.g. Adam fusions from
                        # encoder-matmul fusions
                        elif smd.name in ('tf_op', 'source', 'source_info',
                                          'provenance') and not prov:
                            prov = val
                        # the HLO expression ('fusion.351 = fusion(...),
                        # calls=...') — the drill-down handle for fusions
                        # whose display name says nothing
                        elif smd.name in ('long_name', 'hlo_text',
                                          'expression') and not long:
                            long = val
                    k = (name, cat, prov)
                    tot, cnt, _ = agg.get(k, (0, 0, ''))
                    agg[k] = (tot + ev.duration_ps, cnt + 1, long or _)
                for (name, cat, prov), (tot, cnt, long) in agg.items():
                    rows.append((plane.name, line.name, name, cat, prov,
                                 tot, cnt, long))
    return rows


def attribute(rows, top: int = 25, steps: int | None = None) -> dict:
    """Group rollup + stderr per-op table from parse_xplane() rows.

    Async spans and the while envelope are split out of the group sums
    (module docstring, "Accounting"); group shares are of the envelope
    when one exists, with the itemization shortfall as 'unattributed'.
    With ``steps`` (training steps inside the traced window) each group
    also gets a per-step microsecond cost — the exact shape the PERF.md
    step-decomposition tables use."""
    body = [r for r in rows if event_kind(r[2], r[3]) == 'body']
    envelope = sum(r[5] for r in rows
                   if event_kind(r[2], r[3]) == 'envelope')
    async_ps = sum(r[5] for r in rows if event_kind(r[2], r[3]) == 'async')
    async_n = sum(r[6] for r in rows if event_kind(r[2], r[3]) == 'async')
    body_total = sum(r[5] for r in body)
    groups = {}
    for _, _, name, cat, prov, tot, _, _ in body:
        g = classify(name, cat, prov)
        groups[g] = groups.get(g, 0) + tot
    if envelope > body_total:
        groups['unattributed'] = envelope - body_total
    denom = max(envelope, body_total) or 1
    table = sorted(rows, key=lambda r: -r[5])[:top]
    print(f'{"op":44.44} {"kind":8.8} {"category":14.14} '
          f'{"provenance":30.30} {"us":>10} {"n":>6} {"share":>7}',
          file=sys.stderr)
    for _, _, name, cat, prov, tot, cnt, long in table:
        kind = event_kind(name, cat)
        print(f'{name:44.44} {kind:8.8} {cat:14.14} {prov[-30:]:30.30} '
              f'{tot / 1e6:10.1f} {cnt:6d} '
              f'{100 * tot / denom:6.2f}%', file=sys.stderr)
        if long and kind == 'body':
            print(f'    {long[:150]}', file=sys.stderr)
    out = {
        'total_device_us': round(body_total / 1e6, 1),
        'groups_pct': {g: round(100 * t / denom, 2)
                       for g, t in sorted(groups.items(),
                                          key=lambda kv: -kv[1])},
    }
    if envelope:
        out['envelope_us'] = round(envelope / 1e6, 1)
    if async_ps:
        out['async_spans'] = {'us': round(async_ps / 1e6, 1),
                              'events': async_n, 'overlapped': True}
    if steps:
        out['steps'] = steps
        out['groups_us_per_step'] = {
            g: round(t / 1e6 / steps, 2)
            for g, t in sorted(groups.items(), key=lambda kv: -kv[1])}
        if envelope:
            out['envelope_us_per_step'] = round(envelope / 1e6 / steps, 2)
    return out


def capture(config_name: str, logdir: str, chunks: int = 5,
            overrides: dict | None = None) -> str:
    """Trace ``chunks`` steady-state training chunks of a named config.

    Chunk 0 (compile + first execution) runs OUTSIDE the trace; a scalar
    fetch fences it (the only true sync on the axon platform) before the
    trace opens, and another fence inside the trace closes the window —
    so the capture is pure steady-state device work.
    """
    import jax
    import numpy as np

    from gmvae_tpu import configs
    from gmvae_tpu import training as train_lib
    from gmvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = configs.get_config(config_name, **(overrides or {})).replace(
        eval_every=10**9, ckpt_every=0)
    if cfg.scan_steps < 50:
        cfg = cfg.replace(scan_steps=50)
    steps = cfg.scan_steps * (chunks + 1)
    trainer = train_lib.Trainer(cfg)
    state = trainer.init_state()
    it = trainer.iter_chunk_plans(0, steps)
    s, idx = next(it)
    state, m = trainer.run_chunk(state, idx)
    float(np.asarray(m['elbo'][-1]))              # compile fence
    with jax.profiler.trace(logdir):
        traced = 0
        for s, idx in it:
            state, m = trainer.run_chunk(state, idx)
            traced += s
        float(np.asarray(m['elbo'][-1]))          # in-trace closing fence
    return logdir, traced


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('config', nargs='?', default='mnist_k10')
    ap.add_argument('--parse', metavar='PATH', default=None,
                    help='skip capture; attribute an existing trace')
    ap.add_argument('--logdir', default=None)
    ap.add_argument('--chunks', type=int, default=5)
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--steps', type=int, default=None,
                    help='with --parse: steps inside the traced window, '
                         'for the per-step us rollup')
    ap.add_argument('--set', dest='overrides', action='append', default=[],
                    metavar='key=value')
    args = ap.parse_args(argv)
    steps = args.steps
    if args.parse:
        path = args.parse
    else:
        from gmvae_tpu import configs
        path, steps = capture(
            args.config, args.logdir or tempfile.mkdtemp(prefix='xprof_'),
            chunks=args.chunks,
            overrides=configs.parse_overrides(args.overrides))
        print(f'trace: {path}', file=sys.stderr)
    out = attribute(parse_xplane(path), top=args.top, steps=steps)
    out['config'] = None if args.parse else args.config
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
