"""Subprocess worker for test_online_correction_affirmative_value.

The test's four SLAM runs compile enough big XLA:CPU programs that a
long-lived xdist worker reliably hits the cumulative jaxlib segfault (see
pyproject.toml's addopts note) — the test passes standalone every time and
crashed the worker process twice in full-suite runs.  Running the compute
in a FRESH process stays below the corruption threshold and keeps the
suite deterministic.

Invoked by tests/test_loop_closure.py:
    python loop_value_worker.py <out.npz>
"""

import json
import os
import sys


def main() -> None:
    out_path = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_loop_closure import _two_loop_scene

    from siftgpu_tpu.geometry import align
    from siftgpu_tpu.pipeline import metrics as metrics_mod
    from siftgpu_tpu.pipeline import slam

    frames, gt, intr, cfg, mcfg, scfg, T = _two_loop_scene()
    gtc = align.camera_centers(gt)

    tmp = out_path + ".events"
    online = slam.run_slam(
        frames, intr, cfg, mcfg, scfg,
        metrics=metrics_mod.MetricsLogger(tmp + ".on"),
    )
    slam.run_slam(
        frames, intr, cfg, mcfg,
        dataclasses.replace(scfg, loop_online=False),
        metrics=metrics_mod.MetricsLogger(tmp + ".off"),
    )

    def events(path):
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    ev_on = events(tmp + ".on")
    corr = [i for i, e in enumerate(ev_on)
            if e.get("event") == "loop_correction"]
    frames_before = [
        e["frame"] for e in ev_on[: corr[0]] if e.get("event") == "track"
    ] if corr else []
    t_corr = max(frames_before) if frames_before else T // 2
    t_cut = 22

    on_cut = slam.run_slam(frames[:t_cut], intr, cfg, mcfg, scfg)
    off_cut = slam.run_slam(
        frames[:t_cut], intr, cfg, mcfg,
        dataclasses.replace(scfg, loop_online=False),
    )
    n_pre = 12

    def current_pose_err(res):
        est = align.camera_centers(res.trajectory)
        s, R, t = align.umeyama(est[:n_pre], gtc[:n_pre], with_scale=True)
        aligned = (s * (R @ est.T)).T + t
        return float(np.linalg.norm(aligned[-1] - gtc[t_cut - 1]))

    def tail_inliers(evs):
        xs = [
            e["inliers"] for e in evs
            if e.get("event") == "track" and e.get("frame", 0) > t_corr
        ]
        return float(np.mean(xs)) if xs else 0.0

    np.savez(
        out_path,
        n_corrections=len(corr),
        t_corr=t_corr,
        n_loop_edges=len(online.loop_edges or []),
        err_on=current_pose_err(on_cut),
        err_off=current_pose_err(off_cut),
        tail_inl_on=tail_inliers(ev_on),
        tail_inl_off=tail_inliers(events(tmp + ".off")),
    )


if __name__ == "__main__":
    main()
