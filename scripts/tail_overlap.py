#!/usr/bin/env python
"""Per-octave winner overlap: exact vs the production top-k policy (real TPU).

Validates the topk_approx_min=2^16 policy (approx + batched TAIL octaves
from 640-class up): for every octave of the full production detect_pyramid,
|exact ∩ auto| / |exact| over valid winners, plus the queue-amortized cost
of the whole detect stage under both policies.

Run: python scripts/tail_overlap.py [B H W K]   (solo — single-tenant TPU)
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(np.asarray(leaf).ravel()[0:1])


def main():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from siftgpu_tpu.core.config import SiftConfig
    from siftgpu_tpu.frontend import detect, pyramid
    from siftgpu_tpu.oracle import fixtures

    args = [int(a) for a in sys.argv[1:]]
    B, H, W, K = (args + [4, 480, 640, 2048])[:4] if args else (4, 480, 640, 2048)
    cfg = SiftConfig(height=H, width=W, max_keypoints=K)

    base = fixtures.random_texture(H, W, seed=0, smooth=3)
    frames = [base] + [
        fixtures.warp_affine(base, np.eye(2), np.array([3.0 * i, -2.0 * i]))
        for i in range(1, B)
    ]
    images = jax.device_put(jnp.asarray(np.stack(frames)))
    pyr = jax.jit(lambda im: pyramid.build_pyramid(im, cfg))(images)
    _sync(pyr)

    def winners(cfg_v):
        outs = detect.detect_pyramid(pyr, cfg_v)
        return [(o.y, o.x, o.grad_level, o.mask) for o in outs]

    results = {}
    for name, cfg_v in (
        ("exact", dataclasses.replace(cfg, detect_topk="exact")),
        ("auto", cfg),
    ):
        jf = jax.jit(lambda cv=cfg_v: winners(cv))
        out = jax.device_get(jf())
        t0 = time.perf_counter()
        outs = [jf() for _ in range(20)]
        _sync(outs[-1])
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{name:6s} detect_pyramid {dt:7.2f} ms/iter", flush=True)
        results[name] = out

    for o, (ex, au) in enumerate(zip(results["exact"], results["auto"])):
        ys, xs, _, me = ex
        ya, xa, _, ma = au
        ov_num = ov_den = 0
        for b in range(B):
            se = {(round(float(y) * 4), round(float(x) * 4))
                  for y, x, m in zip(ys[b], xs[b], me[b]) if m}
            sa = {(round(float(y) * 4), round(float(x) * 4))
                  for y, x, m in zip(ya[b], xa[b], ma[b]) if m}
            ov_num += len(se & sa)
            ov_den += len(se)
        ov = ov_num / ov_den if ov_den else 1.0
        print(f"oct{o}: exact {int(np.sum(me))} auto {int(np.sum(ma))} "
              f"overlap {ov:.4f}", flush=True)


if __name__ == "__main__":
    main()
