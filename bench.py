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

if __name__ == '__main__':
    from gmvae_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    print(json.dumps(run_bench()))
