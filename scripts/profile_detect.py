#!/usr/bin/env python
"""Queue-amortized cumulative profile of detect_pyramid internals.

Prefixes: dense scores (all octaves) -> +2x2 pooling -> +top_k ->
full detect (patch gather + refine).  Usage:
  python scripts/profile_detect.py [B H W K [iters]]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0:1])


def main():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from siftgpu_tpu.core.config import SiftConfig
    from siftgpu_tpu.frontend import detect, pyramid
    from siftgpu_tpu.ops.detect_scores import detect_scores
    from siftgpu_tpu.oracle import fixtures

    args = [int(a) for a in sys.argv[1:]]
    B, H, W, K = (args + [4, 480, 640, 2048])[:4] if args else (4, 480, 640, 2048)
    iters = args[4] if len(args) > 4 else 30
    # the detect pass now emits 6 planes; a deep queue of live outputs at 4K
    # exhausts HBM, so bound the in-flight set at large volumes
    if H * W >= 4_000_000:
        iters = min(iters, 6)
    cfg = SiftConfig(height=H, width=W, max_keypoints=K)

    base = fixtures.random_texture(H, W, seed=0, smooth=3)
    frames = [base] + [
        fixtures.warp_affine(base, np.eye(2), np.array([3.0 * i, -2.0 * i]))
        for i in range(1, B)
    ]
    images = jax.device_put(jnp.asarray(np.stack(frames)))
    pyr_fn = jax.jit(lambda im: pyramid.build_pyramid(im, cfg))
    pyr = pyr_fn(images)
    _sync(pyr)
    dogs = [oc.dog for oc in pyr]

    def stage_scores(dogs):
        return [detect_scores(d, cfg, None) for d in dogs]

    def stage_pool(dogs):
        outs = []
        for d in dogs:
            s_max, s_min = detect_scores(d, cfg, None)[:2]
            S = d.shape[1] - 2
            Hs, Ws = s_max.shape[-2:]
            pooled = lambda s: jax.lax.reduce_window(
                s, 0.0, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            nb1 = S * (Hs // 2) * (Ws // 2)
            outs.append(jnp.concatenate(
                [pooled(s_max).reshape(B, nb1), pooled(s_min).reshape(B, nb1)], axis=1))
        return outs

    def stage_topk(dogs):
        return [
            detect.detect_winners(d, cfg, cfg.octave_cap(o))
            for o, d in enumerate(dogs)
        ]

    def stage_full(dogs):
        # rebuild Octave views for detect_pyramid
        return detect.detect_pyramid(pyr, cfg)

    stages = [
        ("scores", stage_scores),
        ("+pool", stage_pool),
        ("+topk", stage_topk),
        ("full detect", stage_full),
    ]
    prev = 0.0
    for name, fn in stages:
        jf = jax.jit(fn)
        out = jf(dogs)
        _sync(out)
        t0 = time.perf_counter()
        outs = [jf(dogs) for _ in range(iters)]
        _sync(outs[-1])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:12s} {dt:8.2f} ms/iter   (+{dt - prev:7.2f})", file=sys.stderr)
        prev = dt

    # per-octave top_k alone (exact vs approx)
    pools = jax.jit(stage_pool)(dogs)
    _sync(pools)
    for o, bs in enumerate(pools):
        cap = cfg.octave_cap(o)
        k = min(cap, bs.shape[1])
        for mode, fn in (
            ("exact", lambda b: jax.lax.top_k(b, k)),
            ("approx", lambda b: jax.lax.approx_max_k(b, k, recall_target=0.9)),
        ):
            jf = jax.jit(fn)
            out = jf(bs)
            _sync(out)
            t0 = time.perf_counter()
            outs = [jf(bs) for _ in range(iters)]
            _sync(outs[-1])
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"top_k oct{o} n={bs.shape[1]:>8d} {mode:6s} {dt:7.2f} ms",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
