#!/usr/bin/env python
"""Microbenchmark of the fused keypoint engine (ops/kp_engine.orient_sample).

Times the kernel alone on an octave-0-like workload (640x480 gradient stack,
N keypoint slots, fraction `valid_frac` valid and front-compacted like the
production prefilter leaves them), queue-amortized over `iters` dispatches.

Usage: python scripts/bench_kp.py [N [P [H W [valid_frac [iters]]]]]
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
    from siftgpu_tpu.ops import kp_engine

    args = [float(a) for a in sys.argv[1:]]
    N = int(args[0]) if len(args) > 0 else 8192
    P = int(args[1]) if len(args) > 1 else 12
    H = int(args[2]) if len(args) > 2 else 480
    W = int(args[3]) if len(args) > 3 else 640
    vf = args[4] if len(args) > 4 else 1.0
    iters = int(args[5]) if len(args) > 5 else 40

    cfg = SiftConfig(height=H, width=W, max_keypoints=2048)
    rng = np.random.default_rng(0)
    gx = jnp.asarray(rng.standard_normal((P, H, W), np.float32))
    gy = jnp.asarray(rng.standard_normal((P, H, W), np.float32))
    plane = jnp.asarray(rng.integers(0, P, N).astype(np.int32))
    ky = jnp.asarray(rng.uniform(8, H - 8, N).astype(np.float32))
    kx = jnp.asarray(rng.uniform(8, W - 8, N).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(1.6, 3.2, N).astype(np.float32))
    mask = jnp.asarray(np.arange(N) < int(N * vf))

    fn = jax.jit(
        lambda *a: kp_engine.orient_sample(*a[:6], cfg, mask=a[6])
    )
    out = fn(gx, gy, plane, ky, kx, sigma, mask)
    np.asarray(out[0].ravel()[0:1])
    t0 = time.perf_counter()
    outs = [fn(gx, gy, plane, ky, kx, sigma, mask) for _ in range(iters)]
    np.asarray(outs[-1][0].ravel()[0:1])
    dt = (time.perf_counter() - t0) / iters
    nvalid = int(N * vf)
    print(
        f"N={N} valid={nvalid} P={P} {W}x{H}: {dt * 1e3:.3f} ms/iter, "
        f"{dt / nvalid * 1e9:.1f} ns/valid-slot, {dt / N * 1e9:.1f} ns/slot"
    )


if __name__ == "__main__":
    main()
