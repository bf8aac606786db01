#!/usr/bin/env python
"""Benchmark harness (the `speed.cpp` analog, SURVEY.md §3.5 ⚠).

Prints ONE JSON line:
  {"metric": "keypoints+matches/s per chip", "value": N, "unit": "items/s",
   "vs_baseline": R}

Protocol (BASELINE.md): steady-state after jit warm-up, `block_until_ready`
timing, per-stage breakdown on stderr.  Workload = BASELINE configs 1-3:
extraction on a batch of 640x480 frames plus brute-force matching of
consecutive 2048-descriptor pairs; value = (valid keypoints extracted +
match pairs emitted) per second on one chip.

`vs_baseline`: BASELINE.json records no published reference numbers
("published": {}, mount empty — SURVEY §6).  We normalize against the
documented order-of-magnitude folklore for the reference on a 2007-era GPU
(~30 Hz * ~1k keypoints at 640x480 + ~4k-descriptor matching in tens of ms
 => ~6e4 items/s), i.e. vs_baseline = value / 60000.0.  Treat it as a
round-over-round trend indicator, not a calibrated comparison.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from siftgpu_tpu import MatchConfig, SiftConfig, extract_features_jit
    from siftgpu_tpu.frontend.match import match_descriptors
    from siftgpu_tpu.oracle import fixtures

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    B, H, W = 4, 480, 640
    K = 2048
    cfg = SiftConfig(height=H, width=W, max_keypoints=K)
    mcfg = MatchConfig(max_sift=K, max_match=K)

    rng = np.random.default_rng(0)
    frames = np.stack(
        [fixtures.random_texture(H, W, seed=i, smooth=3) for i in range(B)]
    )
    images = jax.device_put(jnp.asarray(frames))

    def step(imgs):
        feats = extract_features_jit(imgs, cfg)
        # consecutive-pair matching (frame t vs t+1), SiftMatchGPU workload
        results = []
        for t in range(B - 1):
            results.append(
                match_descriptors(
                    feats.desc[t], feats.desc[t + 1],
                    feats.mask[t], feats.mask[t + 1], mcfg,
                )
            )
        return feats, results

    # warm-up (compile)
    t0 = time.perf_counter()
    feats, results = step(images)
    jax.block_until_ready((feats.mask, [r.count for r in results]))
    print(f"warm-up (incl. compile): {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # steady state
    iters = 5
    t_ex = 0.0
    t_match = 0.0
    kp_total = 0
    match_total = 0
    for _ in range(iters):
        t0 = time.perf_counter()
        feats = extract_features_jit(images, cfg)
        jax.block_until_ready(feats.mask)
        t1 = time.perf_counter()
        rs = []
        for t in range(B - 1):
            rs.append(
                match_descriptors(
                    feats.desc[t], feats.desc[t + 1],
                    feats.mask[t], feats.mask[t + 1], mcfg,
                )
            )
        jax.block_until_ready([r.count for r in rs])
        t2 = time.perf_counter()
        t_ex += t1 - t0
        t_match += t2 - t1
        kp_total += int(np.asarray(feats.count).sum())
        match_total += sum(int(r.count) for r in rs)

    elapsed = t_ex + t_match
    value = (kp_total + match_total) / elapsed
    fps = iters * B / elapsed
    print(
        f"extract: {t_ex / iters * 1e3:.1f} ms/iter ({B} frames {W}x{H}), "
        f"match: {t_match / iters * 1e3:.1f} ms/iter ({B - 1} pairs), "
        f"{fps:.1f} frames/s, {kp_total // iters} kp/iter, "
        f"{match_total // iters} matches/iter",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "keypoints+matches/s per chip",
                "value": round(value, 1),
                "unit": "items/s",
                "vs_baseline": round(value / 60000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
