#!/usr/bin/env python
"""Pyramid-stage probe: fused Pallas kernel vs XLA banded-matmul chain.

Usage: python scripts/probe_pyramid.py [H W [impl]]
  impl: fused | xla | both (default both)
Honors SIFTGPU_PYR_TH / SIFTGPU_PYR_TW sweeps.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from siftgpu_tpu.core.config import SiftConfig
    from siftgpu_tpu.frontend import pyramid
    from siftgpu_tpu.oracle import fixtures

    args = sys.argv[1:]
    H = int(args[0]) if len(args) > 0 else 2160
    W = int(args[1]) if len(args) > 1 else 3840
    which = args[2] if len(args) > 2 else "both"
    B = int(args[3]) if len(args) > 3 else 1
    cfg = SiftConfig(height=H, width=W, max_keypoints=8192)
    img = fixtures.random_texture(H, W, seed=0, smooth=3)
    x = jax.device_put(jnp.asarray(np.stack([img] * B)))

    th = os.environ.get("SIFTGPU_PYR_TH", "128")
    tw = os.environ.get("SIFTGPU_PYR_TW", "128")
    for impl in (["fused", "xla"] if which == "both" else [which]):
        fn = jax.jit(lambda im, impl=impl: pyramid.build_pyramid(
            im, cfg, octave_impl=impl))
        out = fn(x)
        np.asarray(out[0].dog.ravel()[0:1])
        iters = 20
        t0 = time.perf_counter()
        outs = [fn(x) for _ in range(iters)]
        np.asarray(outs[-1][0].dog.ravel()[0:1])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{H}x{W} B{B} {impl:5s} TH={th} TW={tw}: {dt:7.2f} ms/iter",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
