#!/usr/bin/env python
"""Micro-profile of the matcher's stages on the real TPU (run solo).

Breaks the 2048^2 match into components to find where the ~1.4 ms/pair goes:
matmul, best-2 selection, mutual gather, finalize scatter.  Uses deep
dispatch queues + one transfer-sync (block_until_ready does not wait on the
axon platform).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))


def _sync(x):
    np.asarray(x.ravel()[0:1])


def bench(fn, args, iters=60, name=""):
    r = fn(*args)
    _sync(r[0] if isinstance(r, tuple) else r)
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(iters)]
    last = rs[-1]
    _sync(last[0] if isinstance(last, tuple) else last)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.3f} ms", file=sys.stderr)
    return dt


def main():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from siftgpu_tpu.core.config import MatchConfig
    from siftgpu_tpu.frontend import match as M

    N = 2048
    P = 3  # pairs, as in bench.py
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.integers(0, 256, (P, N, 128), dtype=np.uint8))
    d1 = jnp.asarray(rng.integers(0, 256, (P, N, 128), dtype=np.uint8))
    m = jnp.ones((P, N), bool)
    cfg = MatchConfig(max_sift=N, max_match=N)

    # full batched matcher
    f_full = jax.jit(lambda a, b, x, y: M.match_descriptors_batch(a, b, x, y, cfg))
    bench(f_full, (d0, d1, m, m), name="full match_descriptors_batch (3 pairs)")

    # similarity matmul only
    f_sim = jax.jit(jax.vmap(M._similarities))
    bench(f_sim, (d0, d1), name="similarities matmul only")

    sims = f_sim(d0, d1)

    # best-2 selection only
    f_b2 = jax.jit(jax.vmap(M._best2_sim))
    bench(f_b2, (sims,), name="best2 selection")

    # col argmax
    f_col = jax.jit(jax.vmap(lambda s: jnp.argmax(s, axis=0)))
    bench(f_col, (sims,), name="col argmax")

    bsim, ssim, bj = f_b2(sims)
    coli = f_col(sims)

    # finalize (thresholds + mutual gather + scatter compaction)
    f_fin = jax.jit(
        jax.vmap(lambda a, b, c, d: M._finalize(a, b, c, d, cfg))
    )
    bench(f_fin, (bsim, ssim, bj, coli), name="finalize (gather+scatter)")

    # mutual gather alone
    f_mut = jax.jit(jax.vmap(lambda ci, bj_: ci[bj_] == jnp.arange(N)))
    bench(f_mut, (coli, bj), name="mutual gather alone")


if __name__ == "__main__":
    main()
