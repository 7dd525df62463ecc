"""Regenerate the synth model caches under .bench_cache (host-side, CPU).

The cache directory is wiped between driver sessions; bench.py regenerates
lazily but that cost lands inside the driver's timed run. Run this once at
session start:
    JAX_PLATFORMS=cpu python tools/regen_caches.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    t0 = time.perf_counter()
    import bench

    out, _ = bench.flagship_dir(on_tpu=True)
    print(f"flagship {out} ({time.perf_counter() - t0:.1f}s)", flush=True)

    from uzu_tpu.tools import bench8b, bench_qwen08, benchmoe

    for mod in (bench8b, benchmoe, bench_qwen08):
        t0 = time.perf_counter()
        out = mod.model_dir(REPO)
        print(f"{out} ({time.perf_counter() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
