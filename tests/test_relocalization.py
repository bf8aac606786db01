"""Tracking-loss state + relocalization (VERDICT r4 task 3).

A mid-sequence blackout (featureless frames) must put the tracker into a
LOST state: no keyframes inserted, nothing triangulated, pose held — then
recovery, either through live-keyframe matching or through the archived-
keyframe relocalizer.  A contrast test demonstrates the r4 failure mode
the fix removes: with `track_lost=False` a tracking FAILURE satisfies the
keyframe trigger and garbage-pose keyframes poison the map.
"""

import json

import numpy as np

from siftgpu_tpu.core.config import MatchConfig, SiftConfig
from siftgpu_tpu.geometry import align
from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.pipeline import metrics as metrics_mod
from siftgpu_tpu.pipeline import slam

H, W = 144, 192
INTR = (170.0, 170.0, W / 2.0, H / 2.0)
BO = (11, 16)        # blackout frame range [start, end)
T = 24


def _scene():
    """Piecewise motion with a velocity TURN at the blackout: the
    constant-velocity coast (the legacy failure mode) extrapolates the
    pre-blackout direction and lands far from the true camera, while the
    lost-state tracker holds pose and re-registers by matching."""
    stepA = np.array([-0.08, 0.012, 0.006])
    stepB = np.array([0.05, -0.06, -0.004])
    rvA = np.array([0.002, -0.004, 0.001])
    rvB = np.array([-0.003, 0.005, -0.001])
    tvecs = np.zeros((T, 3))
    rvecs = np.zeros((T, 3))
    for k in range(1, T):
        s = stepA if k <= BO[0] else stepB
        r = rvA if k <= BO[0] else rvB
        tvecs[k] = tvecs[k - 1] + s
        rvecs[k] = rvecs[k - 1] + r
    return fixtures.two_plane_sequence_poses(
        rvecs, tvecs, H, W, INTR, d_near=5.0, d_far=10.0, seed=4)


def _run(frames, track_lost, metrics=None):
    cfg = SiftConfig(height=H, width=W, max_keypoints=768)
    mcfg = MatchConfig(max_match=768)
    scfg = slam.SlamConfig(kf_min_inliers=60, kf_flow_px=8.0,
                           init_flow_px=10.0, track_lost=track_lost)
    return slam.run_slam(frames, INTR, cfg, mcfg, scfg, metrics=metrics)


def _ate_outside_blackout(res, gt):
    sel = np.r_[0:BO[0], BO[1]:T]
    est_c = align.camera_centers(res.trajectory)[sel]
    gt_c = align.camera_centers(gt)[sel]
    rmse, _ = align.ate_rmse(est_c, gt_c, with_scale=True)
    return rmse


def test_blackout_recovery_and_no_blackout_keyframes():
    frames, gt = _scene()
    dark = frames.copy()
    dark[BO[0]:BO[1]] = 0.0

    clean = _run(frames, track_lost=True)
    res = _run(dark, track_lost=True)

    # LOST state: not a single keyframe inserted on a blackout frame
    assert not any(BO[0] <= i < BO[1] for i in res.keyframe_indices), \
        res.keyframe_indices
    # tracking recovers after the blackout (confident PnP again)
    post = res.num_tracked[BO[1]:]
    assert max(post) > 20, post
    # accuracy: Sim(3) ATE over the observable frames within 1.5x of the
    # same run without the blackout
    ate_clean = _ate_outside_blackout(clean, gt)
    ate_dark = _ate_outside_blackout(res, gt)
    span = np.linalg.norm(
        align.camera_centers(gt)[-1] - align.camera_centers(gt)[0])
    assert ate_dark < max(1.5 * ate_clean, 0.02 * span), \
        (ate_dark, ate_clean, span)


def test_blackout_legacy_trigger_poisons_map():
    """The r4 behavior this round fixed: with the conflated trigger a
    blackout frame *satisfies* the keyframe condition (flow = inf), so
    garbage-pose keyframes are inserted during the blackout and the run
    degrades — the affirmative contrast for the lost-state fix."""
    frames, gt = _scene()
    dark = frames.copy()
    dark[BO[0]:BO[1]] = 0.0

    res = _run(dark, track_lost=False)
    # keyframes inserted at coasted guess poses during the blackout
    assert any(BO[0] <= i < BO[1] for i in res.keyframe_indices), \
        res.keyframe_indices
    # and the run is measurably worse than the lost-state run
    res_fixed = _run(dark, track_lost=True)
    ate_legacy = _ate_outside_blackout(res, gt)
    ate_fixed = _ate_outside_blackout(res_fixed, gt)
    assert ate_legacy > 1.5 * ate_fixed, (ate_legacy, ate_fixed)


def test_archive_relocalization_after_displacement(tmp_path):
    """Camera pans/translates far from the start (the view leaves the
    start region almost entirely), blacks out, and re-emerges BACK at the
    start: the live keyframes' evidence is thin and drifted there, so
    recovery must come from the archived-keyframe relocalizer (PnP seeded
    from the matched EARLY keyframe's pose).  Asserts the `relocalized`
    event fired against an early keyframe and the post-blackout tail
    re-registers into the EARLY map's frame."""
    T2 = 26
    bo = (14, 18)
    ts = np.array([-0.3, 0.02, 0.0])
    rv = np.array([0.0, -0.03, 0.0])
    rvecs = np.zeros((T2, 3))
    tvecs = np.zeros((T2, 3))
    for k in range(T2):
        if k < bo[0]:
            tvecs[k] = k * ts
            rvecs[k] = k * rv
        elif k < bo[1]:
            tvecs[k] = tvecs[bo[0] - 1]
            rvecs[k] = rvecs[bo[0] - 1]
        else:
            # re-emerge near frame 2's pose, drifting gently so the tail
            # frames are distinct
            j = k - bo[1]
            tvecs[k] = 2 * ts + j * 0.1 * ts
            rvecs[k] = 2 * rv
    frames, gt = fixtures.two_plane_sequence_poses(
        rvecs, tvecs, H, W, INTR, d_near=5.0, d_far=10.0, seed=4)
    dark = frames.copy()
    dark[bo[0]:bo[1]] = 0.0

    mpath = str(tmp_path / "reloc.jsonl")
    ml = metrics_mod.MetricsLogger(mpath)
    res = _run(dark, track_lost=True, metrics=ml)
    ml.close()
    events = [json.loads(line) for line in open(mpath)]
    relocs = [e for e in events if e["event"] == "relocalized"]
    assert any(e["event"] == "track_lost" for e in events)
    assert relocs, {e["event"] for e in events}
    # re-registered against an EARLY keyframe (the start region), not the
    # drifted far-end ones
    assert min(e["kf"] for e in relocs) <= 4, relocs
    assert not any(bo[0] <= i < bo[1] for i in res.keyframe_indices)
    # tail accuracy IN THE EARLY MAP'S FRAME: align on the healthy early
    # segment only, then demand the relocalized tail lands near its ground
    # truth under that alignment (the mid-run drift is not under test)
    est_c = align.camera_centers(res.trajectory)
    gt_c = align.camera_centers(gt)
    early = np.arange(0, 9)
    s, R, tt = align.umeyama(est_c[early], gt_c[early], with_scale=True)
    aligned = (s * (R @ est_c.T)).T + tt
    tail = np.arange(bo[1] + 1, T2)   # first reloc frame may recover late
    tail_err = np.linalg.norm(aligned[tail] - gt_c[tail], axis=1)
    span = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
    assert tail_err.max() < 0.10 * span, (tail_err, span)
