#!/usr/bin/env python
"""Guided-match (H/F gated) throughput on the real TPU (run solo).

VERDICT r4 task 5's measured number: 8k x 8k guided matching through the
fused Pallas kernel (gates computed per tile in VMEM) vs the XLA streaming
guided path (the r4 production route).  Deep-queue min-over-reps protocol.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))


def _sync(x):
    np.asarray(x.ravel()[0:1])


def bench(fn, args, iters=40, reps=4, name=""):
    r = fn(*args)
    _sync(r[0] if isinstance(r, tuple) else r)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(iters)]
        last = rs[-1]
        _sync(last[0] if isinstance(last, tuple) else last)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{name:46s} {best:8.3f} ms", file=sys.stderr)
    return best


def main():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from siftgpu_tpu.core.config import MatchConfig
    from siftgpu_tpu.frontend import match as M

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(7)
    d0 = jax.device_put(jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8)))
    d1 = jax.device_put(jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8)))
    loc0 = jax.device_put(jnp.asarray(rng.uniform(0, 4096, (N, 2)).astype(np.float32)))
    loc1 = jax.device_put(jnp.asarray(rng.uniform(0, 4096, (N, 2)).astype(np.float32)))
    H = jnp.asarray(np.array([[1, 0, 12.0], [0, 1, -7.0], [0, 0, 1]], np.float32))
    e = rng.uniform(-1, 1, 3)
    Ex = np.array([[0, -e[2], e[1]], [e[2], 0, -e[0]], [-e[1], e[0], 0]])
    F = jnp.asarray((Ex @ rng.uniform(-1, 1, (3, 3))).astype(np.float32) * 1e-4)

    cfg = MatchConfig(max_sift=N, max_match=4096)
    cfg_xla = cfg.replace(use_pallas=False)

    for Hj, Fj, tag in ((H, None, "H"), (None, F, "F"), (H, F, "HF")):
        f_fused = jax.jit(lambda a, b, x, y, Hj=Hj, Fj=Fj: M.guided_match_descriptors(
            a, b, x, y, H=Hj, F=Fj, cfg=cfg))
        f_xla = jax.jit(lambda a, b, x, y, Hj=Hj, Fj=Fj: M.guided_match_descriptors(
            a, b, x, y, H=Hj, F=Fj, cfg=cfg_xla))
        r0 = f_fused(d0, d1, loc0, loc1)
        r1 = f_xla(d0, d1, loc0, loc1)
        same = np.array_equal(np.asarray(r0.pairs), np.asarray(r1.pairs))
        print(f"{tag}: fused vs XLA pairs identical: {same} "
              f"(count {int(r0.count)})", file=sys.stderr)
        bench(f_fused, (d0, d1, loc0, loc1), name=f"guided {tag} {N} fused kernel")
        bench(f_xla, (d0, d1, loc0, loc1), name=f"guided {tag} {N} XLA streaming")


if __name__ == "__main__":
    main()
