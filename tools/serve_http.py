"""Minimal HTTP model server over a ``jax.export`` serving artifact.

The last mile of the serving story (gmvae_tpu/serving.py): a stdlib-only
binary that loads ONE exported artifact and serves it over HTTP. No
gmvae_tpu import, no model code, no checkpoint — the artifact is the
whole model, which is the point of the AOT export path.

    python tools/serve_http.py runs/mnist_k10/assign.jaxexport --port 8901

Protocol (numpy wire format, zero deps on the client beyond numpy):
  POST /predict   body = ``np.save`` bytes of float32 [B, H, W, C] in [0,1]
                  -> 200, body = ``np.savez`` bytes: {out0, out1, ...}
  GET  /healthz   -> 200 'ok' once the artifact is loaded

Client sketch:
    buf = io.BytesIO(); np.save(buf, x)
    r = urllib.request.urlopen(url + '/predict', data=buf.getvalue())
    outs = np.load(io.BytesIO(r.read()))   # outs['out0'] = ids

Single-device artifacts accept any batch size (symbolic dim; each new
shape compiles once). Data-parallel artifacts (``dp_batch`` exports) need
their fixed batch and ``nr_devices`` local devices — the server shards
the input over a mesh it builds at startup, exactly like
``serving.load_and_call``.
"""

from __future__ import annotations

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: script mode
# puts tools/ (not the repo root) on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

# ThreadingHTTPServer handles each request on its own thread; device
# execution is serialized through one lock so concurrent requests queue
# instead of interleaving runtime calls
_CALL_LOCK = threading.Lock()


def make_handler(exported, put_fn, max_body_bytes: int = 64 * 1024 * 1024):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path == '/healthz':
                body = b'ok'
                self.send_response(200)
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != '/predict':
                self.send_error(404)
                return
            try:
                # input parsing + shape validation: failures here are the
                # CLIENT's (400)
                n = int(self.headers['Content-Length'])
                if n > max_body_bytes:
                    # refuse BEFORE reading: the declared length is
                    # client-controlled, and reading it unconditionally
                    # lets one request exhaust host RAM (--max-body-mb)
                    self._send_json_error(413, ValueError(
                        f'request body {n} bytes exceeds the server cap '
                        f'{max_body_bytes} (raise with --max-body-mb)'))
                    return
                x = np.asarray(
                    np.load(io.BytesIO(self.rfile.read(n)),
                            allow_pickle=False), np.float32)
                want = exported.in_avals[0].shape
                ok = len(want) == x.ndim and all(
                    not isinstance(w, int) or w == g
                    for w, g in zip(want, x.shape))
                if not ok:
                    raise ValueError(
                        f'input shape {x.shape} does not match the '
                        f'artifact spec {tuple(want)} (symbolic dims '
                        f'accept any size)')
            except Exception as e:
                self._send_json_error(400, e)
                return
            try:
                # execution: failures here are the SERVER's (500 —
                # platform mismatch, device errors; 4xx would point
                # retry/debug logic at innocent clients)
                with _CALL_LOCK:
                    out = exported.call(put_fn(x))
                    leaves = (out if isinstance(out, (tuple, list))
                              else (out,))
                    leaves = [np.asarray(leaf) for leaf in leaves]
                buf = io.BytesIO()
                np.savez(buf, **{f'out{i}': leaf
                                 for i, leaf in enumerate(leaves)})
                body = buf.getvalue()
                self.send_response(200)
                self.send_header('Content-Type', 'application/octet-stream')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                self._send_json_error(500, e)

        def _send_json_error(self, code: int, exc: Exception):
            body = json.dumps(
                {'error': f'{type(exc).__name__}: {exc}'}).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def make_server(artifact_path: str, host: str = '127.0.0.1',
                port: int = 8901,
                max_body_bytes: int = 64 * 1024 * 1024
                ) -> ThreadingHTTPServer:
    """Build (but don't start) the server; port 0 picks an ephemeral port."""
    import jax
    from jax import export as jexport

    with open(artifact_path, 'rb') as f:
        exported = jexport.deserialize(f.read())
    if exported.nr_devices > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec
        devs = jax.devices()
        if len(devs) < exported.nr_devices:
            raise ValueError(
                f'artifact needs {exported.nr_devices} devices; '
                f'{len(devs)} available')
        mesh = Mesh(np.asarray(devs[:exported.nr_devices]), ('data',))
        sh = NamedSharding(mesh, PartitionSpec('data'))
        put_fn = lambda x: jax.device_put(x, sh)
    else:
        put_fn = lambda x: x
    return ThreadingHTTPServer(
        (host, port), make_handler(exported, put_fn, max_body_bytes))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('artifact')
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--port', type=int, default=8901)
    ap.add_argument('--max-body-mb', type=int, default=64,
                    help='reject request bodies larger than this (413)')
    args = ap.parse_args()
    srv = make_server(args.artifact, args.host, args.port,
                      max_body_bytes=args.max_body_mb * 1024 * 1024)
    print(json.dumps({'serving': args.artifact,
                      'url': f'http://{srv.server_address[0]}:'
                             f'{srv.server_address[1]}'}), flush=True)
    srv.serve_forever()
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
