#!/usr/bin/env python
"""One-off probes for the 4K detect budget (round 5): Cramer-solve cost in
the dense stencil, and top-k call-structure alternatives.

Usage: python scripts/probe_detect4k.py [H W]
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


def bench(fn, *args, iters=20, label=""):
    import jax

    jf = jax.jit(fn)
    out = jf(*args)
    _sync(out)
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    _sync(outs[-1])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:8.2f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from siftgpu_tpu.core.config import SiftConfig
    from siftgpu_tpu.frontend import detect, pyramid
    from siftgpu_tpu.ops.detect_scores import detect_scores
    from siftgpu_tpu.oracle import fixtures

    args = [int(a) for a in sys.argv[1:]]
    H, W = (args + [2160, 3840])[:2] if args else (2160, 3840)
    cfg = SiftConfig(height=H, width=W, max_keypoints=8192)
    cfg_nosub = dataclasses.replace(cfg, subpixel=False)

    base = fixtures.random_texture(H, W, seed=0, smooth=3)
    images = jax.device_put(jnp.asarray(base[None]))
    pyr = jax.jit(lambda im: pyramid.build_pyramid(im, cfg))(images)
    _sync(pyr)
    dogs = [oc.dog for oc in pyr]

    # --- stencil ablations (octave 0 only, then all octaves) ---
    bench(lambda d: detect_scores(d, cfg, None), dogs[0],
          label="scores oct0 subpixel=True")
    bench(lambda d: detect_scores(d, cfg_nosub, None), dogs[0],
          label="scores oct0 subpixel=False (no Cramer)")
    bench(lambda ds: [detect_scores(d, cfg, None) for d in ds], dogs,
          label="scores ALL oct subpixel=True")
    bench(lambda ds: [detect_scores(d, cfg_nosub, None) for d in ds], dogs,
          label="scores ALL oct subpixel=False")

    # --- pooled candidate arrays (built once, device-resident) ---
    def pool_all(ds):
        outs = []
        for d in ds:
            bs, _, _, _ = detect._octave_scores(d, cfg, None)
            outs.append(bs)
        return outs

    bscores = jax.jit(pool_all)(dogs)
    _sync(bscores)
    for o, b in enumerate(bscores):
        print(f"oct{o} pooled n={b.shape[1]}", file=sys.stderr)

    caps = [cfg.octave_cap(o) for o in range(len(dogs))]
    k0 = caps[0]

    # --- top-k structures on octave 0 ---
    b0 = bscores[0]
    n0 = b0.shape[1]
    bench(lambda b: jax.lax.approx_max_k(b, k0, recall_target=0.97), b0,
          label=f"oct0 approx_max_k k={k0} [1,{n0}]")
    bench(lambda b: jax.lax.approx_max_k(b, k0, recall_target=0.9), b0,
          label="oct0 approx recall=0.9")
    bench(lambda b: jax.lax.approx_max_k(b, 2048, recall_target=0.97), b0,
          label="oct0 approx k=2048")
    # two-stage: approx k per 16 chunks, then exact merge
    R = 16
    npad = -(-n0 // R) * R
    kc = max(512, k0 // 4)

    def two_stage(b):
        bp = jnp.pad(b, ((0, 0), (0, npad - n0))).reshape(R, npad // R)
        v, i = jax.lax.approx_max_k(bp, kc, recall_target=0.97)
        base_i = jnp.arange(R, dtype=jnp.int32)[:, None] * (npad // R)
        v = v.reshape(1, R * kc)
        i = (i.astype(jnp.int32) + base_i).reshape(1, R * kc)
        tv, ti = jax.lax.top_k(v, k0)
        return tv, jnp.take_along_axis(i, ti, axis=1)

    bench(two_stage, b0, label=f"oct0 two-stage R={R} kc={kc} + exact merge")

    # --- tail octaves: current batched-padded vs split groups ---
    tails = bscores[1:]
    n_max = max(b.shape[1] for b in tails)
    k_max = max(min(c, b.shape[1]) for c, b in zip(caps[1:], tails))

    def batched(ts):
        batch = jnp.concatenate(
            [jnp.pad(b, ((0, 0), (0, n_max - b.shape[1]))) for b in ts], axis=0
        )
        return jax.lax.approx_max_k(batch, k_max, recall_target=0.97)

    bench(batched, tails, label=f"tails batched [7,{n_max}] k={k_max}")

    def split(ts):
        outs = [jax.lax.approx_max_k(ts[0], min(caps[1], ts[0].shape[1]),
                                     recall_target=0.97)]
        n2 = max(b.shape[1] for b in ts[1:])
        k2 = max(min(c, b.shape[1]) for c, b in zip(caps[2:], ts[1:]))
        batch = jnp.concatenate(
            [jnp.pad(b, ((0, 0), (0, n2 - b.shape[1]))) for b in ts[1:]],
            axis=0,
        )
        outs.append(jax.lax.approx_max_k(batch, k2, recall_target=0.97))
        return outs

    bench(split, tails, label="tails split: oct1 alone + [oct2..] batched")


if __name__ == "__main__":
    main()
