#!/usr/bin/env python
"""Benchmark harness (the `speed.cpp` analog, SURVEY.md §3.5 ⚠).

Prints ONE JSON line:
  {"metric": "keypoints+matches/s per chip", "value": N, "unit": "items/s",
   "vs_baseline": R}

Protocol (BASELINE.md): steady-state after jit warm-up; device sync via a
1-element host transfer per iteration (`block_until_ready` does NOT wait on
the axon remote-TPU platform — see pipeline/profile.py); per-stage breakdown
on stderr.  Workload = BASELINE configs 1-3: extraction on a batch of 640x480
frames related by known warps plus brute-force matching of consecutive pairs
(real correspondences, so the matcher's output is nontrivial), and a
secondary 1080p extraction measurement.

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


def _sync(x):
    np.asarray(x.ravel()[0:1])


def main() -> None:
    import os

    import jax

    # persistent compilation cache: first-time remote compiles take ~7 min
    # through the tunnel; subsequent bench runs (e.g. the driver's) reuse them
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from siftgpu_tpu import MatchConfig, SiftConfig, extract_features_jit
    from siftgpu_tpu.frontend.match import match_descriptors_batch
    from siftgpu_tpu.oracle import fixtures

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    B, H, W = 4, 480, 640
    K = 2048
    cfg = SiftConfig(height=H, width=W, max_keypoints=K)
    mcfg = MatchConfig(max_sift=K, max_match=K)

    base = fixtures.random_texture(H, W, seed=0, smooth=3)
    frames = [base]
    for i in range(1, B):   # consecutive frames: known shifts -> real matches
        frames.append(
            fixtures.warp_affine(base, np.eye(2), np.array([3.0 * i, -2.0 * i]))
        )
    images = jax.device_put(jnp.asarray(np.stack(frames)))

    def extract():
        return extract_features_jit(images, cfg)

    # all B-1 consecutive pairs in ONE dispatch (vmapped matcher).  The
    # consecutive-pair slicing lives INSIDE the jit: eager `desc[:-1]`
    # slices were 4 extra tunnel dispatches per iteration and dominated the
    # match phase (reps 2.7-7.2 ms for a 0.7 ms program)
    _match_sliced = jax.jit(
        lambda desc, mask: match_descriptors_batch(
            desc[:-1], desc[1:], mask[:-1], mask[1:], mcfg
        )
    )

    def match_pairs(feats):
        return _match_sliced(feats.desc, feats.mask)

    # warm-up (compile)
    t0 = time.perf_counter()
    feats = extract()
    _sync(feats.mask)
    rs = match_pairs(feats)
    _sync(rs.dist)
    print(f"warm-up (incl. compile): {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Steady state.  The device executes dispatches in order, so queueing all
    # iterations and syncing once amortizes the host<->device round-trip
    # (~25 ms on the tunneled platform) instead of paying it per iteration;
    # the queue must be deep enough that the initial pipeline fill (one RTT)
    # is negligible per iteration (10 iters left ~2.5 ms/iter of RTT inside
    # the number).
    #
    # Each phase runs REPS times and reports the MIN: the tunnel's RTT and
    # host scheduling jitter inflated single-shot numbers by up to 2.5x
    # round-over-round (the r02 "match regression" — 3.8 -> 6.0 ms with
    # unchanged code — reproduced at 2.4 ms the next day), and the min over
    # a few deep-queue reps is the honest steady-state of the device.
    iters, REPS = 40, 5
    reps_ex, reps_match = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        all_feats = [extract() for _ in range(iters)]
        _sync(all_feats[-1].mask)
        t1 = time.perf_counter()
        all_rs = [match_pairs(f) for f in all_feats]
        _sync(all_rs[-1].dist)
        reps_ex.append((t1 - t0) / iters)
        reps_match.append((time.perf_counter() - t1) / iters)
    t_ex = min(reps_ex)
    t_match = min(reps_match)
    kp_total = int(np.asarray(all_feats[0].count).sum()) * iters
    match_total = int(np.asarray(all_rs[0].count).sum()) * iters

    elapsed = (t_ex + t_match) * iters
    value = (kp_total + match_total) / elapsed
    fps = iters * B / elapsed
    print(
        f"640x480: extract {t_ex * 1e3:.1f} ms/iter ({B} frames), "
        f"match {t_match * 1e3:.1f} ms/iter ({B - 1} pairs), "
        f"{fps:.1f} frames/s, {kp_total // iters} kp/iter, "
        f"{match_total // iters} matches/iter "
        f"[reps ex {['%.1f' % (v * 1e3) for v in reps_ex]} "
        f"match {['%.1f' % (v * 1e3) for v in reps_match]}]",
        file=sys.stderr,
    )

    # secondary: 1080p extraction (BASELINE config 3)
    try:
        H2, W2 = 1088, 1920
        cfg2 = SiftConfig(height=H2, width=W2, max_keypoints=4096)
        img2 = jax.device_put(
            jnp.asarray(fixtures.random_texture(H2, W2, seed=7, smooth=3)[None])
        )
        f2 = extract_features_jit(img2, cfg2)
        _sync(f2.mask)
        # queue depth 32: at the old 20 the ~25 ms tunnel RTT left ~1.2 ms/
        # iter of pure dispatch latency inside the number (same fix as the
        # 16k section in round 5's first pass)
        n2 = 32
        r2 = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fs = [extract_features_jit(img2, cfg2) for _ in range(n2)]
            _sync(fs[-1].mask)
            r2.append((time.perf_counter() - t0) / n2)
        dt2 = min(r2)
        f2 = fs[-1]
        print(
            f"1080p: {dt2 * 1e3:.1f} ms/frame, {1 / dt2:.1f} fps, "
            f"{int(np.asarray(f2.count)[0])} kp",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover - secondary metric must not kill bench
        print(f"1080p bench failed: {e}", file=sys.stderr)
        dt2 = None

    # tertiary: 4K extraction (config 3 upper end; the reference caps its
    # working dim at ~3200 px and would downsample 4K — we run it native)
    try:
        H3, W3 = 2160, 3840
        cfg3 = SiftConfig(height=H3, width=W3, max_keypoints=8192)
        img3 = jax.device_put(
            jnp.asarray(fixtures.random_texture(H3, W3, seed=9, smooth=3)[None])
        )
        f3 = extract_features_jit(img3, cfg3)
        _sync(f3.mask)
        # queue depth 24 (was 10: ~2.5 ms/iter of tunnel RTT was being
        # attributed to the device); bounded by the live 6-plane record
        # outputs' HBM footprint at 4K
        n3 = 24
        r3 = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fs3 = [extract_features_jit(img3, cfg3) for _ in range(n3)]
            _sync(fs3[-1].mask)
            r3.append((time.perf_counter() - t0) / n3)
        dt3 = min(r3)
        print(
            f"4K: {dt3 * 1e3:.1f} ms/frame, {1 / dt3:.1f} fps, "
            f"{int(np.asarray(fs3[-1].count)[0])} kp",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover
        print(f"4K bench failed: {e}", file=sys.stderr)
        dt3 = None

    # large-set streaming matcher (auto-engaged above MatchConfig.
    # stream_threshold): 16k x 16k descriptors — the dense path's similarity
    # buffer alone would be 1 GB; the streaming scan holds O(N0 * block)
    dt16 = None
    try:
        rng16 = np.random.default_rng(3)
        N16 = 16384
        d0_16 = jax.device_put(
            jnp.asarray(rng16.integers(0, 256, (N16, 128), dtype=np.uint8))
        )
        d1_16 = jax.device_put(
            jnp.asarray(rng16.integers(0, 256, (N16, 128), dtype=np.uint8))
        )
        mcfg16 = MatchConfig(max_sift=N16, max_match=N16)
        from siftgpu_tpu.frontend.match import match_descriptors

        r16 = match_descriptors(d0_16, d1_16, cfg=mcfg16)
        _sync(r16.dist)
        # deep queue: a queue of N carries ~RTT/N per iter of tunnel
        # round-trip inside the number — at the old n16=6 that was ~4 ms/iter
        # of pure dispatch overhead attributed to a ~2 ms compute (the r4
        # 5.45 ms record); 32 matches the 640-section protocol
        n16 = 32
        reps16 = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            rs16 = [match_descriptors(d0_16, d1_16, cfg=mcfg16) for _ in range(n16)]
            _sync(rs16[-1].dist)
            reps16.append((time.perf_counter() - t0) / n16)
        dt16 = min(reps16)
        print(f"16k x 16k streaming match: {dt16 * 1e3:.1f} ms/pair",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"16k match bench failed: {e}", file=sys.stderr)

    # per-stage attribution (VERDICT r2 missing #2): the `-v 2` ClockTimer
    # table analog, embedded in the artifact so round-over-round regressions
    # are attributable from the record alone.  Stages compile separately
    # (cached); stage sum > fused total because stage boundaries force
    # device syncs the fused program doesn't have.
    stages = {}
    try:
        from siftgpu_tpu.pipeline.profile import profile_extraction

        times = profile_extraction(images, cfg, iters=40, mcfg=mcfg)
        stages = {k: round(v * 1e3, 2) for k, v in times.items()}
        print("stage table (640x480 b4, ms/iter): "
              + ", ".join(f"{k} {v}" for k, v in stages.items()),
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"stage profile failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "keypoints+matches/s per chip",
                "value": round(value, 1),
                "unit": "items/s",
                "vs_baseline": round(value / 60000.0, 3),
                "extract_640_ms": round(t_ex * 1e3, 2),
                "match_640_ms": round(t_match * 1e3, 2),
                "reps_640_ms": [round(v * 1e3, 2) for v in reps_ex],
                "reps_match_ms": [round(v * 1e3, 2) for v in reps_match],
                "ms_1080p": None if dt2 is None else round(dt2 * 1e3, 2),
                "ms_4k": None if dt3 is None else round(dt3 * 1e3, 2),
                "ms_match16k_stream": None if dt16 is None else round(dt16 * 1e3, 2),
                "stages_640_ms": stages,
            }
        )
    )


if __name__ == "__main__":
    main()
