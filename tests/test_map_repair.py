"""Map repair after loop closure (VERDICT r3 tasks 3 + 8).

A synthetic drifted SLAM state with known ground truth: keyframes on an
out-and-back path, per-keyframe Sim(3) drift (scale ramp + translation)
applied to poses AND to each map point through its anchor keyframe — the
internally-consistent way monocular drift actually manifests.  A measured
loop edge (what detect_loop's dual-PnP + scale ratio would produce) feeds
`apply_pose_graph_sim3`; the assertions check the THREE deliverables:

  1. the trajectory correction (keyframes move toward ground truth);
  2. the MAP moves coherently with it (post-correction reprojection of map
     points against corrected poses stays tight; without anchor transport it
     blows up — the r3 gap);
  3. the measured-SCALE edge beats the scale-0 edge on a scale-drift scene
     (task 8's bar).
"""

import numpy as np
import pytest

from siftgpu_tpu.geometry import pose as P
from siftgpu_tpu.pipeline import slam as S

import jax.numpy as jnp


def _project(pose6, X, intr):
    R, t = P.exp_se3(jnp.asarray(pose6, jnp.float32))
    xc = X @ np.asarray(R).T + np.asarray(t)
    return np.asarray(intr[:2]) * xc[:, :2] / xc[:, 2:] + np.asarray(intr[2:])


def _drifted_state(M=12, n_per=40, s_end=1.35, t_end=0.5, seed=0):
    """Ground-truth out-and-back chain + per-keyframe Sim(3)-drifted
    estimate.  Returns (keyframes, trajectory, map_X, map_mask, map_anchor,
    gt_centers, intr, X_true)."""
    rng = np.random.default_rng(seed)
    intr = (200.0, 200.0, 96.0, 72.0)
    half = M // 2
    ks = np.concatenate([np.arange(half), np.arange(half - 1, -1, -1)])[:M]
    C = np.stack([0.35 * ks, 0.02 * ks, -0.01 * ks], 1)   # camera centers
    gt6 = np.stack([np.zeros(3).repeat(1) * 0 for _ in range(M)])
    gt6 = np.zeros((M, 6), np.float32)
    gt6[:, 3:] = -C                                        # R = I, t = -C

    # map points: anchored n_per per keyframe, in front of that camera
    pts, anchors = [], []
    for k in range(M):
        Xk = np.stack([
            C[k, 0] + rng.uniform(-1.5, 1.5, n_per),
            C[k, 1] + rng.uniform(-1.0, 1.0, n_per),
            rng.uniform(4.0, 8.0, n_per),
        ], 1)
        pts.append(Xk)
        anchors += [k] * n_per
    X_true = np.concatenate(pts).astype(np.float32)
    anchors = np.asarray(anchors, np.int32)
    Npts = len(X_true)

    # smooth Sim(3) drift per keyframe: scale ramp + translation ramp
    u = np.arange(M) / (M - 1)
    sig = np.exp(np.log(s_end) * u)
    delta = np.stack([t_end * u, -0.3 * t_end * u, 0.2 * t_end * u], 1)

    # drifted map: each point through its anchor's drift
    map_X = (sig[anchors, None] * X_true + delta[anchors]).astype(np.float32)
    # drifted poses: consistent with the drifted anchored points
    # (R_hat = R, t_hat = sig*t - R*delta, so reprojection of anchored
    # points is EXACT through the drifted state)
    est6 = gt6.copy()
    est6[:, 3:] = sig[:, None] * gt6[:, 3:] - delta

    keyframes = []
    for k in range(M):
        # observed: own anchored points + the neighbors' (slow drift makes
        # the cross-anchor reprojection slightly inconsistent — realistic)
        obs = np.nonzero(np.abs(anchors - k) <= 1)[0]
        uv = _project(est6[k], map_X[obs], intr)
        # visibility: inside a generous frame
        vis = (np.abs(uv[:, 0] - intr[2]) < 300) & (np.abs(uv[:, 1] - intr[3]) < 300)
        obs = obs[vis]
        uv = uv[vis]
        keyframes.append(S.Keyframe(
            frame_idx=k, pose=est6[k].copy(), feats=None,
            kp=dict(x=uv[:, 0].astype(np.float32),
                    y=uv[:, 1].astype(np.float32),
                    mask=np.ones(len(obs), bool), desc=None),
            pt_ids=obs.astype(np.int64),
        ))
    trajectory = est6.copy()
    map_mask = np.ones(Npts, bool)
    return (keyframes, trajectory, map_X, map_mask, anchors.copy(),
            C, intr, X_true)


def _loop_edge_rel7(gt6, i, j, s_rel):
    """What detect_loop measures for a revisit i -> j: dual-PnP SE(3)
    relative in i's local frame + the pairwise scale ratio (see the chart
    derivation in pipeline/slam.py)."""
    Ri, ti = P.exp_se3(jnp.asarray(gt6[i]))
    Rj, tj = P.exp_se3(jnp.asarray(gt6[j]))
    Rr, tr = P.relative(Ri, ti, Rj, tj)
    rel7 = np.zeros(7, np.float32)
    rel7[:3] = np.asarray(P.log_so3(Rr))
    rel7[3:6] = s_rel * np.asarray(tr)
    rel7[6] = np.log(s_rel)
    return rel7


def _centers(traj):
    R, t = P.exp_se3(jnp.asarray(traj, jnp.float32))
    return -np.einsum("mji,mj->mi", np.asarray(R), np.asarray(t))


def _reproj_med(keyframes, map_X, intr):
    errs = []
    for k in keyframes:
        uv = _project(k.pose, map_X[k.pt_ids], intr)
        ref = np.stack([k.kp["x"], k.kp["y"]], 1)
        errs.append(np.linalg.norm(uv - ref, axis=1))
    return float(np.median(np.concatenate(errs)))


def test_map_repaired_with_trajectory():
    """After the Sim(3) correction the map must ride with the keyframes:
    reprojection stays tight; without anchor transport (the r3 behavior)
    it blows up."""
    (kfs, traj, map_X, map_mask, anchor, C, intr, X_true) = _drifted_state()
    M = len(kfs)
    gt6 = np.zeros((M, 6), np.float32)
    gt6[:, 3:] = -C
    s_end = np.exp(np.log(1.35) * 1.0)
    edges = [(0, M - 1, _loop_edge_rel7(gt6, 0, M - 1, s_end), 60.0,
              np.zeros((0, 2), np.int64))]

    before = _reproj_med(kfs, map_X, intr)
    assert before < 1.0  # the drifted state is internally consistent

    # --- r3 behavior: poses corrected, map untouched (anchor = -1) ---
    import copy
    kfs_nr = copy.deepcopy(kfs)
    traj_nr = traj.copy()
    map_nr = map_X.copy()
    S.apply_pose_graph_sim3(
        kfs_nr, traj_nr, map_nr, map_mask.copy(),
        np.full(len(map_X), -1, np.int32), edges,
    )
    after_norepair = _reproj_med(kfs_nr, map_nr, intr)

    # --- full repair: map rides the anchors ---
    changed = S.apply_pose_graph_sim3(
        kfs, traj, map_X, map_mask, anchor, edges,
    )
    assert changed
    after = _reproj_med(kfs, map_X, intr)

    assert after < 3.0, f"repaired map reprojection {after}px"
    assert after < 0.2 * after_norepair, (
        f"map repair must beat pose-only correction: {after} vs {after_norepair}"
    )
    # trajectory moved toward ground truth
    est_c = _centers(traj)
    ate = np.sqrt(np.mean(np.sum((est_c - C) ** 2, axis=1)))
    assert ate < 0.25, f"corrected ATE {ate}"


def test_measured_scale_edge_beats_scale0():
    """Task 8's bar: on a scale-drift scene the measured-scale edge must
    beat the scale-0 (SE(3)-only) edge on ATE."""
    (kfs0, traj0, mx0, mm0, an0, C, intr, X_true) = _drifted_state()
    M = len(kfs0)
    gt6 = np.zeros((M, 6), np.float32)
    gt6[:, 3:] = -C
    s_end = np.exp(np.log(1.35) * 1.0)

    import copy

    def run(rel7):
        kfs = copy.deepcopy(kfs0)
        traj = traj0.copy()
        mx = mx0.copy()
        edges = [(0, M - 1, rel7, 60.0, np.zeros((0, 2), np.int64))]
        S.apply_pose_graph_sim3(kfs, traj, mx, mm0.copy(), an0.copy(), edges)
        est_c = _centers(traj)
        return float(np.sqrt(np.mean(np.sum((est_c - C) ** 2, axis=1))))

    drift_ate = float(np.sqrt(np.mean(
        np.sum((_centers(traj0) - C) ** 2, axis=1))))

    rel7_scale = _loop_edge_rel7(gt6, 0, M - 1, s_end)
    rel7_se3 = _loop_edge_rel7(gt6, 0, M - 1, 1.0)
    ate_scale = run(rel7_scale)
    ate_se3 = run(rel7_se3)

    assert ate_scale < drift_ate * 0.5, (ate_scale, drift_ate)
    assert ate_scale < ate_se3 * 0.8, (
        f"measured-scale edge must beat scale-0: {ate_scale} vs {ate_se3}"
    )


def test_landmark_fusion_remaps_and_frees():
    """Duplicated-landmark fusion: new slots fold into old slots in every
    keyframe's pt_ids, the new slots are freed, and fusion chains are
    path-compressed."""
    (kfs, traj, map_X, map_mask, anchor, C, intr, X_true) = _drifted_state()
    M = len(kfs)
    gt6 = np.zeros((M, 6), np.float32)
    gt6[:, 3:] = -C
    # pretend the loop identified duplicates: last keyframe's first three
    # anchored points are the same physical points as keyframe 0's first 3
    n_per = 40
    old_slots = np.asarray([0, 1, 2])
    new_slots = np.asarray([(M - 1) * n_per + i for i in range(3)])
    fuse = np.stack([old_slots, new_slots], 1).astype(np.int64)
    edges = [(0, M - 1, _loop_edge_rel7(gt6, 0, M - 1, 1.35), 60.0, fuse)]
    S.apply_pose_graph_sim3(kfs, traj, map_X, map_mask, anchor, edges)
    assert not map_mask[new_slots].any(), "fused slots must be freed"
    assert map_mask[old_slots].all()
    for k in kfs:
        assert not np.isin(k.pt_ids, new_slots).any(), (
            "pt_ids must be remapped off fused slots"
        )


def test_refit_map_points_restores_consistency():
    """`refit_map_points` (points-only Huber GN, poses pinned): perturbed
    landmarks return to reprojection consistency without any pose moving."""
    (kfs, traj, map_X, map_mask, anchor, C, intr, X_true) = _drifted_state(
        s_end=1.0, t_end=0.0)   # undrifted, internally consistent state
    before = _reproj_med(kfs, map_X, intr)
    assert before < 0.5

    rng = np.random.default_rng(3)
    map_X_noisy = map_X + rng.normal(0, 0.05, map_X.shape).astype(np.float32)
    noisy = _reproj_med(kfs, map_X_noisy, intr)
    assert noisy > 1.0

    poses_before = np.stack([k.pose for k in kfs])
    S.refit_map_points(kfs, map_X_noisy, map_mask, intr, iters=4)
    after = _reproj_med(kfs, map_X_noisy, intr)
    assert after < 0.35 * noisy, (after, noisy)
    np.testing.assert_array_equal(
        np.stack([k.pose for k in kfs]), poses_before,
    )
