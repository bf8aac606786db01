#!/usr/bin/env python
"""Probe: oct0 4K two-stage top-k parameter sweep (R, kc, recall) with
winner-set overlap vs exact top-k.

Usage: python scripts/probe_topk0.py [H W [cap]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0:1])


def bench(fn, *args, iters=20):
    import jax

    jf = jax.jit(fn)
    out = jf(*args)
    _sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [jf(*args) for _ in range(iters)]
        _sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best, out


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from siftgpu_tpu.core.config import SiftConfig
    from siftgpu_tpu.frontend import detect, pyramid
    from siftgpu_tpu.oracle import fixtures

    args = [int(a) for a in sys.argv[1:]]
    H, W, cap = (args + [2160, 3840, 8192])[: 3] if args else (2160, 3840, 8192)
    cfg = SiftConfig(height=H, width=W, max_keypoints=cap)

    base = fixtures.random_texture(H, W, seed=0, smooth=3)
    images = jax.device_put(jnp.asarray(base[None]))
    pyr = jax.jit(lambda im: pyramid.build_pyramid(im, cfg))(images)
    _sync(pyr)
    b0, _, _, _ = jax.jit(
        lambda d: detect._octave_scores(d, cfg, None))(pyr[0].dog)
    _sync(b0)
    n0 = b0.shape[1]
    k0 = min(cap, n0)
    print(f"oct0 pooled n={n0} k={k0}", file=sys.stderr, flush=True)

    # exact winners (ground truth; slow single run, not timed)
    _, ex_idx = jax.jit(lambda b: jax.lax.top_k(b, k0))(b0)
    ex = set(np.asarray(ex_idx)[0].tolist())

    def two_stage(R, kc, rc):
        npad = -(-n0 // R) * R

        def fn(b):
            bp = jnp.pad(b, ((0, 0), (0, npad - n0))).reshape(R, npad // R)
            v, i = jax.lax.approx_max_k(bp, kc, recall_target=rc)
            base_i = jnp.arange(R, dtype=jnp.int32)[:, None] * (npad // R)
            v = v.reshape(1, R * kc)
            i = (i.astype(jnp.int32) + base_i).reshape(1, R * kc)
            tv, ti = jax.lax.top_k(v, k0)
            return tv, jnp.take_along_axis(i, ti, axis=1)

        return fn

    def single(rc):
        return lambda b: jax.lax.approx_max_k(b, k0, recall_target=rc)

    cands = {
        "prod R=16 kc=k/2 rc=.90": two_stage(16, k0 // 2, 0.90),
        "R=16 kc=k/4 rc=.90": two_stage(16, k0 // 4, 0.90),
        "R=16 kc=k/4 rc=.95": two_stage(16, k0 // 4, 0.95),
        "R=8  kc=k/4 rc=.90": two_stage(8, k0 // 4, 0.90),
        "R=32 kc=k/8 rc=.90": two_stage(32, k0 // 8, 0.90),
        "R=32 kc=k/4 rc=.90": two_stage(32, k0 // 4, 0.90),
        "single rc=.90": single(0.90),
        "single rc=.95": single(0.95),
    }
    for name, fn in cands.items():
        dt, out = bench(fn, b0)
        idx = np.asarray(out[1])[0]
        ov = len(ex & set(idx.tolist())) / len(ex)
        print(f"{name:28s} {dt:7.2f} ms  overlap {ov:.4f}", flush=True)


if __name__ == "__main__":
    main()
