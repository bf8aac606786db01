#!/usr/bin/env python
"""Queue-amortized cumulative stage profile of the production extract path.

Times jitted PREFIXES of the pipeline (pyramid; +detect; +prefilter; +grads;
+fused orient/desc; +assemble) with deep dispatch queues, so stage cost =
difference of adjacent prefixes.  Unlike pipeline/profile.py this follows the
exact production composition (including prefilter_candidates) and amortizes
the ~25 ms tunnel RTT over the queue depth.

Usage: python scripts/profile_extract.py [B H W K [iters]]
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
    from siftgpu_tpu.frontend import detect, extract, orient, pyramid
    from siftgpu_tpu.oracle import fixtures

    args = [int(a) for a in sys.argv[1:]]
    B, H, W, K = (args + [4, 480, 640, 2048])[:4] if args else (4, 480, 640, 2048)
    iters = args[4] if len(args) > 4 else 30
    cfg = SiftConfig(height=H, width=W, max_keypoints=K)

    base = fixtures.random_texture(H, W, seed=0, smooth=3)
    frames = [base] + [
        fixtures.warp_affine(base, np.eye(2), np.array([3.0 * i, -2.0 * i]))
        for i in range(1, B)
    ]
    images = jax.device_put(jnp.asarray(np.stack(frames)))

    def stage_pyr(im):
        return pyramid.build_pyramid(im, cfg)

    def stage_detect(im):
        return detect.detect_pyramid(stage_pyr(im), cfg)

    def stage_prefilter(im):
        return extract.prefilter_candidates(stage_detect(im), cfg)

    def stage_grads(im):
        pyr = stage_pyr(im)
        kps = extract.prefilter_candidates(detect.detect_pyramid(pyr, cfg), cfg)
        return kps, [orient.gradient_stack(oc.gauss, cfg) for oc in pyr]

    def stage_fused(im):
        from siftgpu_tpu.frontend import fused

        pyr = stage_pyr(im)
        kps = extract.prefilter_candidates(detect.detect_pyramid(pyr, cfg), cfg)
        outs = []
        for oc, kp in zip(pyr, kps):
            g = orient.gradient_stack(oc.gauss, cfg)
            outs.append(fused.orient_describe_fused(g, kp, cfg))
        return outs

    def stage_full(im):
        return extract.extract_features(im, cfg)

    stages = [
        ("pyramid", stage_pyr),
        ("+detect", stage_detect),
        ("+prefilter", stage_prefilter),
        ("+grads", stage_grads),
        ("+fused o/d", stage_fused),
        ("full", stage_full),
    ]
    prev = 0.0
    for name, fn in stages:
        jf = jax.jit(fn)
        out = jf(images)
        _sync(out)
        t0 = time.perf_counter()
        outs = [jf(images) for _ in range(iters)]
        _sync(outs[-1])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:12s} {dt:8.2f} ms/iter   (+{dt - prev:7.2f})", file=sys.stderr)
        prev = dt

    f = jax.jit(stage_full)(images)
    _sync(f)
    print(f"kp count: {np.asarray(f.mask).sum(axis=1)}", file=sys.stderr)


if __name__ == "__main__":
    main()
