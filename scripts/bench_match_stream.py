#!/usr/bin/env python
"""Dense vs streaming matcher on the real TPU (run solo).

Measures SetMaxSift-class and beyond (4k/8k/16k/32k descriptor sets) and a
block-size sweep for the FlashAttention-style streaming path
(`frontend/match._match_streaming`), to back the auto-engagement policy in
`MatchConfig` (stream_threshold / stream_block).  The dense path's
[N, N] f32 similarity buffer is 1 GB at 16k and 4 GB at 32k — the streaming
scan never materializes it.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))


def _sync(x):
    np.asarray(x.ravel()[0:1])


def bench(fn, args, iters, name):
    r = fn(*args)
    _sync(r.dist)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(iters)]
        _sync(rs[-1].dist)
        dt = (time.perf_counter() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name:44s} {best:9.3f} ms", file=sys.stderr)
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

    rng = np.random.default_rng(0)
    out = {}
    for N in (4096, 8192, 16384, 32768):
        d0 = jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8))
        d1 = jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8))
        m = jnp.ones(N, bool)
        iters = max(4, 1 << max(0, 16 - N.bit_length()))
        row = {}
        if N <= 16384:  # dense beyond 16k: 4 GB similarity buffer, skip
            cfg = MatchConfig(max_sift=N, max_match=N, block_size=-1)
            f = jax.jit(lambda a, b, x, y, c=cfg: M.match_descriptors_impl(a, b, x, y, c))
            row["dense"] = bench(f, (d0, d1, m, m), iters, f"{N}x{N} dense")
        for blk in (1024, 2048, 4096, 8192):
            if blk >= N:
                continue
            cfg = MatchConfig(max_sift=N, max_match=N, block_size=blk)
            f = jax.jit(lambda a, b, x, y, c=cfg: M.match_descriptors_impl(a, b, x, y, c))
            row[f"stream{blk}"] = bench(f, (d0, d1, m, m), iters, f"{N}x{N} stream blk={blk}")
        out[N] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
