"""Acceptance-protocol tooling tests (VERDICT r3 #6): the one-command
dress rehearsal must be provenance-stamped and --require-real must fail
fast BEFORE any training when real data is absent."""

import sys

import numpy as np
import pytest

sys.path.insert(0, 'tools')
import reproduce_baselines as rb  # noqa: E402


def _write_mnist_npz(d):
    rng = np.random.default_rng(3)
    np.savez(d / 'mnist.npz',
             train_x=rng.integers(0, 256, (64, 28, 28, 1), dtype=np.uint8),
             train_y=np.zeros(64, np.int32),
             test_x=rng.integers(0, 256, (16, 28, 28, 1), dtype=np.uint8),
             test_y=np.zeros(16, np.int32))


def test_require_real_fails_fast_listing_missing(tmp_path, monkeypatch):
    monkeypatch.setenv('GMVAE_DATA_DIR', str(tmp_path))  # empty dir
    with pytest.raises(SystemExit) as e:
        rb.preflight_require_real({'mnist_k10', 'svhn_conv'})
    msg = str(e.value)
    assert 'mnist_k10 (mnist)' in msg and 'svhn_conv (svhn)' in msg
    assert '2 row(s)' in msg


def test_require_real_passes_with_real_fixture(tmp_path, monkeypatch):
    monkeypatch.setenv('GMVAE_DATA_DIR', str(tmp_path))
    _write_mnist_npz(tmp_path)
    rb.preflight_require_real({'mnist_k10'})     # must not raise


def test_require_real_skips_frozen_synthetic_fixture(tmp_path, monkeypatch):
    """synthetic_hard IS the real (frozen) fixture — --require-real must
    not demand a file for it."""
    monkeypatch.setenv('GMVAE_DATA_DIR', str(tmp_path))
    rb.preflight_require_real({'synthetic_hard'})


def test_main_require_real_exits_before_training(tmp_path, monkeypatch):
    """The CLI path: a --require-real run with no data must exit without
    measuring anything (measure() would take minutes)."""
    monkeypatch.setenv('GMVAE_DATA_DIR', str(tmp_path))
    calls = []
    monkeypatch.setattr(rb, 'measure',
                        lambda *a, **k: calls.append(a) or {})
    with pytest.raises(SystemExit, match='require-real'):
        rb.main(['mnist_k10', '--require-real'])
    assert calls == []


def test_main_row_carries_provenance(tmp_path, monkeypatch, capsys):
    """Rows emitted by main() carry synthetic_standin + source."""
    import json
    monkeypatch.setenv('GMVAE_DATA_DIR', str(tmp_path))
    _write_mnist_npz(tmp_path)

    def fake_measure(name, steps, n_eval, kw, require_real=False):
        cfg = rb.configs.get_config(name, **kw)
        ds = rb.data_lib.load(cfg.dataset, image_shape=cfg.image_shape,
                              allow_synthetic_fallback=not require_real)
        return {'config': name, 'synthetic_standin': ds.synthetic,
                'source': ds.source}

    monkeypatch.setattr(rb, 'measure', fake_measure)
    rb.main(['mnist_k10', '--require-real'])
    row = json.loads(capsys.readouterr().out.strip())
    assert row['synthetic_standin'] is False
    assert row['source'].startswith('npz:')


def test_parity_conv_matched_noise_flag(monkeypatch, capsys):
    """--matched-noise runs the fused arm with fused_noise='xla' (the
    oracle's exact draws streamed into the kernel) and stamps every row."""
    import json
    import parity_conv as pc

    seen = []

    def fake_measure(name, steps, n_eval, kw):
        seen.append(kw)
        return {'config': name, 'elbo_nats': -100.0, 'acc': 1.0, 'nmi': 1.0}

    monkeypatch.setattr(pc, 'measure', fake_measure)
    pc.main(['svhn_conv', '--matched-noise'])
    assert seen == [{'fused': True, 'fused_noise': 'xla'}, {'fused': False}]
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert all(r['matched_noise'] for r in rows)
    assert rows[-1]['parity'] and rows[-1]['within_1pct']

    seen.clear()
    pc.main(['svhn_conv'])
    assert seen == [{'fused': True}, {'fused': False}]


def test_parity_conv_seed_override_and_fused_plan(monkeypatch, capsys):
    """--seed threads into BOTH arms' config kwargs and stamps every row
    (the basin-resolved multi-seed protocol, VERDICT r4 #1); the PLAN
    covers every named config that ships fused=True, incl. mnist_vae and
    fmnist_deep (VERDICT r4 weak #2)."""
    import json
    import parity_conv as pc
    from gmvae_tpu import configs

    # every named config shipping fused=True needs a parity row; the deep
    # family is exempt (models/deep.py: the fused Pallas head does not
    # apply — no Gumbel-softmax head)
    fused_ships = {n for n in configs.CONFIGS
                   if configs.get_config(n).fused
                   and configs.get_config(n).model_family != 'deep'}
    assert fused_ships <= {n for n, *_ in pc.PLAN}
    assert {'mnist_vae', 'fmnist_deep', 'synthetic_hard'} <= {
        n for n, *_ in pc.PLAN}

    seen = []

    def fake_measure(name, steps, n_eval, kw):
        seen.append(kw)
        return {'config': name, 'elbo_nats': -100.0, 'acc': 1.0, 'nmi': 1.0}

    monkeypatch.setattr(pc, 'measure', fake_measure)
    pc.main(['celeba_dp16', '--matched-noise', '--seed', '2'])
    assert all(k['seed'] == 2 for k in seen), seen
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert all(r['seed'] == 2 for r in rows)


def test_profile_attr_parses_device_xplane(tmp_path):
    """parse_xplane + attribute on a synthesized TPU-shaped XSpace: op-line
    selection (no double-booking the 'XLA Modules' wrapper), per-op
    aggregation, category extraction, and the group rollup
    (tools/profile_attr.py, VERDICT r3 #3)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    import profile_attr as pa

    xs = xplane_pb2.XSpace()
    plane = xs.planes.add(name='/device:TPU:0')
    mods = plane.lines.add(name='XLA Modules')
    ops = plane.lines.add(name='XLA Ops')
    cat_md = plane.stat_metadata[1]
    cat_md.id, cat_md.name = 1, 'hlo_category'

    tf_md = plane.stat_metadata[2]
    tf_md.id, tf_md.name = 2, 'tf_op'

    def add_op(mid, name, cat, dur_ps, n=1, prov=''):
        md = plane.event_metadata[mid]
        md.id, md.name = mid, name
        if cat:
            st = md.stats.add(metadata_id=1)
            st.str_value = cat
        if prov:
            st = md.stats.add(metadata_id=2)
            st.str_value = prov
        for _ in range(n):
            ops.events.add(metadata_id=mid, duration_ps=dur_ps)

    # module wrapper spans everything; must NOT be counted
    wmd = plane.event_metadata[99]
    wmd.id, wmd.name = 99, 'jit_train_chunk'
    mods.events.add(metadata_id=99, duration_ps=10_000_000)

    add_op(1, 'fusion.1', 'convolution', 3_000_000)
    add_op(2, 'custom-call.2', '', 2_000_000)         # pallas head
    add_op(3, 'all-reduce.3', 'all reduce', 1_000_000)
    add_op(4, 'fusion.7', '', 500_000, n=2)           # generic fusion
    # provenance (jax scoped op name) must split optimizer fusions out of
    # the generic-fusion bucket
    add_op(5, 'fusion.9', '', 500_000, n=2,
           prov='jit(chunk)/adam/update_moment')
    f = tmp_path / 'train.xplane.pb'
    f.write_bytes(xs.SerializeToString())
    rows = pa.parse_xplane(str(f))
    assert {r[2] for r in rows} == {'fusion.1', 'custom-call.2',
                                    'all-reduce.3', 'fusion.7', 'fusion.9'}
    agg = {r[2]: r for r in rows}
    assert agg['fusion.7'][5:7] == (1_000_000, 2)     # summed + counted
    assert agg['fusion.1'][3] == 'convolution'
    assert agg['fusion.9'][4] == 'jit(chunk)/adam/update_moment'
    out = pa.attribute(rows, top=5)
    assert out['total_device_us'] == 8.0
    assert out['groups_pct'] == {'matmul': 37.5, 'head_kernel': 25.0,
                                 'optimizer': 12.5, 'loop_fusion': 12.5,
                                 'collectives': 12.5}
    assert 'envelope_us' not in out and 'async_spans' not in out


def test_profile_attr_envelope_and_async_accounting(tmp_path):
    """TPU traces carry three event kinds that must not be summed together
    (first real v5e capture: 339 ms of overlapped DMA spans inside a 47 ms
    loop): async copy spans are split out, the while envelope is the
    per-step denominator, and the itemization shortfall becomes the
    'unattributed' group (tools/profile_attr.py, VERDICT r3 #3)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    import profile_attr as pa

    xs = xplane_pb2.XSpace()
    plane = xs.planes.add(name='/device:TPU:0')
    ops = plane.lines.add(name='XLA Ops')
    cat_md = plane.stat_metadata[1]
    cat_md.id, cat_md.name = 1, 'hlo_category'

    def add_op(mid, name, cat, dur_ps, n=1):
        md = plane.event_metadata[mid]
        md.id, md.name = mid, name
        if cat:
            st = md.stats.add(metadata_id=1)
            st.str_value = cat
        for _ in range(n):
            ops.events.add(metadata_id=mid, duration_ps=dur_ps)

    # 10-step while envelope of 100 us; 60 us of itemized body ops; an
    # overlapped 500 us DMA span that must NOT enter the group sums
    add_op(1, 'while.5', 'while', 100_000_000)
    add_op(2, 'fusion.1', 'convolution', 4_000_000, n=10)
    add_op(3, 'custom-call.2', '', 2_000_000, n=10)
    add_op(4, 'async-copy', 'copy-start', 500_000_000)
    f = tmp_path / 'train.xplane.pb'
    f.write_bytes(xs.SerializeToString())
    out = pa.attribute(pa.parse_xplane(str(f)), top=5, steps=10)
    assert out['envelope_us'] == 100.0
    assert out['envelope_us_per_step'] == 10.0
    assert out['total_device_us'] == 60.0             # body only
    assert out['async_spans'] == {'us': 500.0, 'events': 1,
                                  'overlapped': True}
    # shares are of the envelope; shortfall -> unattributed
    assert out['groups_pct'] == {'matmul': 40.0, 'unattributed': 40.0,
                                 'head_kernel': 20.0}
    assert out['groups_us_per_step'] == {'matmul': 4.0,
                                         'unattributed': 4.0,
                                         'head_kernel': 2.0}


def test_chaos_floor_lr_perturbation_plumbs_through(capsys):
    """tools/chaos_floor.py (VERDICT r4 #1, round 5): the perturbed arm's
    lr actually reaches training — with a deliberately huge --eps the two
    arms' trained ELBOs must differ (a tiny real run, same mechanics as
    the celeba chaos-floor protocol), and every row/summary carries the
    stamps the PERF.md analysis reads. The eps->0 limit (bit-identical
    arms) is the measured result documented in the module docstring."""
    import json
    import chaos_floor as cf

    cf.main(['--config', 'synthetic_tiny', '--seeds', '0', '--steps', '40',
             '--checkpoints', '40', '--eval-examples', '64',
             '--batch-size', '32', '--eps', '0.5'])
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    arms = {r['arm'] for r in rows if 'arm' in r}
    assert arms == {'oracle', 'perturbed'}
    summary = [r for r in rows if r.get('chaos_floor')]
    assert len(summary) == 1 and summary[0]['step'] == 40
    assert summary[0]['perturb_rel'] == 0.5
    # lr*1.5 over 40 steps must visibly move the trajectory
    assert summary[0]['elbo_rel_delta_pct'] > 0
    assert summary[0]['elbo_oracle'] != summary[0]['elbo_perturbed']
