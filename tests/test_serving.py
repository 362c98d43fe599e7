"""AOT serving exports (gmvae_tpu/serving.py): serialized batch-polymorphic
StableHLO artifacts for the inference verbs, asserted equal to the live
API on the same inputs, self-contained (params baked in), and
cross-lowerable for TPU from a CPU host."""

import os

import jax
import numpy as np
import pytest

from gmvae_tpu import api, configs, serving
from gmvae_tpu import training as train_lib


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    cfg = configs.synthetic_tiny(
        steps=120, eval_every=120, ckpt_every=0,
        run_dir=str(tmp_path_factory.mktemp('serving_runs')))
    trainer, state, _ = train_lib.fit(cfg)
    return cfg, trainer, state


def test_assign_artifact_matches_live_api(trained, tmp_path):
    cfg, trainer, state = trained
    path = os.path.join(tmp_path, 'assign.jaxexport')
    blob = serving.export_verb(trainer, state, 'assign', path=path)
    assert os.path.getsize(path) == len(blob) > 0

    xs = trainer.dataset.test_x[:48]
    got = np.asarray(serving.load_and_call(path,
                                           xs.astype(np.float32) / 255.0))
    want = api.cluster_assign(trainer, state, xs)
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.int32

    # metadata sidecar identifies the artifact without deserializing it
    import json
    with open(path + '.json') as f:
        meta = json.load(f)
    assert meta['verb'] == 'assign'
    assert meta['config'] == cfg.name
    assert meta['nr_devices'] == 1 and meta['dp_batch'] is None
    assert meta['image_shape'] == list(cfg.image_shape)


def test_artifact_is_batch_polymorphic(trained):
    """One artifact serves ANY batch size (symbolic leading dim)."""
    cfg, trainer, state = trained
    blob = serving.export_verb(trainer, state, 'probs')
    for n in (1, 7, 64):
        x = trainer.dataset.test_x[:n].astype(np.float32) / 255.0
        probs = np.asarray(serving.load_and_call(blob, x))
        assert probs.shape == (n, cfg.n_components)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_reconstruct_and_latent_artifacts(trained):
    cfg, trainer, state = trained
    xs = trainer.dataset.test_x[:16]
    xf = xs.astype(np.float32) / 255.0

    rec = np.asarray(serving.load_and_call(
        serving.export_verb(trainer, state, 'reconstruct'), xf))
    np.testing.assert_allclose(rec, api.reconstruct(trainer, state, xs),
                               rtol=1e-5, atol=1e-6)

    z, probs = serving.load_and_call(
        serving.export_verb(trainer, state, 'latent'), xf)
    z_live, probs_live = api.latent_embed(trainer, state, xs)
    np.testing.assert_allclose(np.asarray(z), z_live, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(probs), probs_live,
                               rtol=1e-5, atol=1e-6)


def test_artifact_is_self_contained(trained):
    """Deserialization + call needs only jax.export — params are baked-in
    constants, no gmvae_tpu import, no checkpoint file."""
    cfg, trainer, state = trained
    blob = serving.export_verb(trainer, state, 'assign')
    from jax import export as jexport
    fn = jexport.deserialize(blob)
    x = trainer.dataset.test_x[:8].astype(np.float32) / 255.0
    out = np.asarray(fn.call(x))
    assert out.shape == (8,)
    # the artifact embeds the trained weights: a fresh-params export differs
    state0 = trainer.init_state()
    blob0 = serving.export_verb(trainer, state0, 'probs')
    x = trainer.dataset.test_x[:32].astype(np.float32) / 255.0
    p_trained = np.asarray(serving.load_and_call(
        serving.export_verb(trainer, state, 'probs'), x))
    p_init = np.asarray(serving.load_and_call(blob0, x))
    assert not np.allclose(p_trained, p_init)


def test_cross_platform_tpu_export_from_cpu(trained):
    """platforms=['tpu'] lowers a TPU artifact on this CPU host (it cannot
    be CALLED here — only serialized — which is the build-machine story)."""
    cfg, trainer, state = trained
    blob = serving.export_verb(trainer, state, 'assign', platforms=['tpu'])
    assert len(blob) > 0
    from jax import export as jexport
    assert 'tpu' in tuple(jexport.deserialize(blob).platforms)


def test_deep_variant_exports_too(tmp_path_factory):
    cfg = configs.synthetic_tiny(
        model_family='deep', w_dim=4, prior_hidden=16, steps=60,
        eval_every=60, ckpt_every=0,
        run_dir=str(tmp_path_factory.mktemp('serving_deep')))
    trainer, state, _ = train_lib.fit(cfg)
    xs = trainer.dataset.test_x[:8]
    got = np.asarray(serving.load_and_call(
        serving.export_verb(trainer, state, 'assign'),
        xs.astype(np.float32) / 255.0))
    np.testing.assert_array_equal(got, api.cluster_assign(trainer, state, xs))


def test_data_parallel_artifact(tmp_path_factory):
    """dp_batch exports a sharded artifact over the full 8-device mesh;
    it reproduces the live API on the same inputs and records the device
    count it needs."""
    n = jax.device_count()
    assert n == 8, 'conftest forces 8 fake devices'
    cfg = configs.synthetic_tiny(
        steps=60, eval_every=60, ckpt_every=0, dp_devices=n,
        run_dir=str(tmp_path_factory.mktemp('serving_dp')))
    trainer, state, _ = train_lib.fit(cfg)

    blob = serving.export_verb(trainer, state, 'assign', dp_batch=64)
    from jax import export as jexport
    assert jexport.deserialize(blob).nr_devices == n

    xs = trainer.dataset.test_x[:64]
    got = np.asarray(serving.load_and_call(blob,
                                           xs.astype(np.float32) / 255.0))
    np.testing.assert_array_equal(got,
                                  api.cluster_assign(trainer, state, xs))

    z, probs = serving.load_and_call(
        serving.export_verb(trainer, state, 'latent', dp_batch=64),
        xs.astype(np.float32) / 255.0)
    z_live, probs_live = api.latent_embed(trainer, state, xs)
    np.testing.assert_allclose(np.asarray(z), z_live, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(probs), probs_live,
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match='divide'):
        serving.export_verb(trainer, state, 'assign', dp_batch=63)

    # the options compose: a data-parallel AND int8-quantized artifact
    qdp = serving.export_verb(trainer, state, 'probs', dp_batch=64,
                              quantize='int8')
    assert jexport.deserialize(qdp).nr_devices == n
    p = np.asarray(serving.load_and_call(qdp,
                                         xs.astype(np.float32) / 255.0))
    p_live = np.asarray(serving.load_and_call(
        serving.export_verb(trainer, state, 'probs', dp_batch=64),
        xs.astype(np.float32) / 255.0))
    np.testing.assert_allclose(p, p_live, atol=0.05)


def test_http_server_roundtrip(trained, tmp_path):
    """tools/serve_http.py serves an artifact over HTTP: npy in, npz out,
    equal to the live API; bad input gets a 400 with a JSON error."""
    import io
    import json
    import sys
    import threading
    import urllib.request
    import urllib.error

    tools_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             '..', 'tools')
    sys.path.insert(0, tools_dir)
    try:
        import serve_http
    finally:
        sys.path.pop(0)

    cfg, trainer, state = trained
    path = os.path.join(tmp_path, 'assign.jaxexport')
    serving.export_verb(trainer, state, 'assign', path=path)
    # small body cap so the 413 path is exercised without a huge payload
    srv = serve_http.make_server(path, port=0,   # ephemeral port
                                 max_body_bytes=16 * 1024)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f'http://{srv.server_address[0]}:{srv.server_address[1]}'
        with urllib.request.urlopen(url + '/healthz', timeout=30) as r:
            assert r.read() == b'ok'

        xs = trainer.dataset.test_x[:24]
        buf = io.BytesIO()
        np.save(buf, xs.astype(np.float32) / 255.0)
        with urllib.request.urlopen(
                urllib.request.Request(url + '/predict',
                                       data=buf.getvalue()),
                timeout=120) as r:
            outs = np.load(io.BytesIO(r.read()))
        np.testing.assert_array_equal(outs['out0'],
                                      api.cluster_assign(trainer, state, xs))

        # malformed payload -> 400 with a JSON error body
        try:
            urllib.request.urlopen(
                urllib.request.Request(url + '/predict', data=b'not-npy'),
                timeout=30)
            raise AssertionError('expected HTTP 400')
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert 'error' in json.loads(e.read())

        # well-formed npy of the WRONG shape is also the client's fault
        bad = io.BytesIO()
        np.save(bad, np.zeros((4, 3, 3, 9), np.float32))
        try:
            urllib.request.urlopen(
                urllib.request.Request(url + '/predict',
                                       data=bad.getvalue()), timeout=30)
            raise AssertionError('expected HTTP 400')
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert 'artifact spec' in json.loads(e.read())['error']

        # a body over the server's cap is refused BEFORE being read (413):
        # the declared Content-Length is client-controlled and must not be
        # able to exhaust host RAM (ADVICE r3)
        big = io.BytesIO()
        np.save(big, np.zeros((200, 8, 8, 1), np.float32))  # ~50 KB > 16 KB
        assert len(big.getvalue()) > 16 * 1024
        try:
            urllib.request.urlopen(
                urllib.request.Request(url + '/predict',
                                       data=big.getvalue()), timeout=30)
            raise AssertionError('expected HTTP 413')
        except urllib.error.HTTPError as e:
            assert e.code == 413
            assert 'exceeds the server cap' in json.loads(e.read())['error']
    finally:
        srv.shutdown()
        srv.server_close()


def test_int8_quantized_artifact(trained):
    """Weight-only int8 export: substantially smaller artifact, near-exact
    behavior (the only error is int8 rounding of the weight matrices)."""
    cfg, trainer, state = trained
    full = serving.export_verb(trainer, state, 'probs')
    quant = serving.export_verb(trainer, state, 'probs', quantize='int8')
    assert len(quant) < len(full) / 2.5, (len(quant), len(full))

    xs = trainer.dataset.test_x[:256]
    xf = xs.astype(np.float32) / 255.0
    p_full = np.asarray(serving.load_and_call(full, xf))
    p_quant = np.asarray(serving.load_and_call(quant, xf))
    # responsibilities shift only by weight-rounding noise...
    np.testing.assert_allclose(p_quant, p_full, atol=0.05)
    # ...and hard assignments agree on (at least) 99% of examples
    agree = (p_quant.argmax(-1) == p_full.argmax(-1)).mean()
    assert agree >= 0.99, agree

    with pytest.raises(ValueError, match='quantize'):
        serving.export_verb(trainer, state, 'probs', quantize='fp4')


@pytest.mark.parametrize('arch', ['conv', 'resnet'])
def test_conv_family_exports(arch, tmp_path_factory):
    """The Gaussian-likelihood conv/ResNet families export and reproduce
    the live API too (reconstruct exercises the transposed-conv decoder)."""
    cfg = configs.synthetic_tiny(
        arch=arch, image_shape=(8, 8, 3), likelihood='gaussian',
        binarize=False, enc_hidden=(8, 16), dec_hidden=(16, 8),
        latent_dim=8, steps=40, eval_every=40, ckpt_every=0,
        run_dir=str(tmp_path_factory.mktemp(f'serving_{arch}')))
    trainer, state, _ = train_lib.fit(cfg)
    xs = trainer.dataset.test_x[:8]
    xf = xs.astype(np.float32) / 255.0
    got = np.asarray(serving.load_and_call(
        serving.export_verb(trainer, state, 'assign'), xf))
    np.testing.assert_array_equal(got, api.cluster_assign(trainer, state, xs))
    rec = np.asarray(serving.load_and_call(
        serving.export_verb(trainer, state, 'reconstruct'), xf))
    np.testing.assert_allclose(rec, api.reconstruct(trainer, state, xs),
                               rtol=1e-5, atol=1e-6)


def test_unknown_verb_rejected(trained):
    cfg, trainer, state = trained
    with pytest.raises(ValueError, match='verb'):
        serving.export_verb(trainer, state, 'nope')
