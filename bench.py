"""Driver benchmark entry: MNIST GMVAE training images/sec/chip.

Prints exactly ONE JSON line (the driver records it in BENCH_r{N}.json).
Thin wrapper over gmvae_tpu.benchmark.run_bench — see that module for
methodology (compile excluded, device->host fetch as the timing fence).
"""

import json

try:
    from gmvae_tpu.benchmark import run_bench
except ImportError:  # driver runs this file in place, package not installed
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gmvae_tpu.benchmark import run_bench

def _backend_reachable(timeout_s: int = 180) -> bool:
    """Bounded backend probe in a subprocess.

    The axon remote-TPU tunnel, when down, HANGS backend init forever
    (observed outage) — probing in-process would hang this entry point
    too, and the driver would record a timeout instead of a diagnosis.
    """
    import os
    import subprocess
    import sys
    try:
        p = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            env=dict(os.environ), timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == '__main__':
    import sys
    if not _backend_reachable():
        print('bench.py: accelerator backend unreachable (remote-TPU '
              'tunnel down or hung) — retry when the tunnel recovers',
              file=sys.stderr)
        sys.exit(3)
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    print(json.dumps(run_bench()))
