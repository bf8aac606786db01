"""BASELINE config-5 sequence pipeline: keyframe-partitioned multi-host SLAM.

The north star's "keyframes and map blocks partitioned across a pod slice"
(BASELINE.json:5, SURVEY §2.3 multi-host row ⚠): a T-frame sequence is
processed as

  1. extraction of ALL frames data-parallel over the mesh's `data` axis
     (`dp.extract_features_dp`, chunked so HBM stays bounded) — the keyframe
     partitioning leg; features gather back to one global store;
  2. the sequential tracking/mapping loop (`pipeline.slam.run_slam`) consumes
     the pre-extracted features (match + PnP dispatches only) and maintains
     ONE global map;
  3. every windowed BA call runs the DISTRIBUTED Schur-complement solve
     (`dist_ba`: map blocks partitioned over the flattened mesh, one psum of
     the reduced camera system per CG iteration);
  4. a final pose-graph refinement over all keyframes runs with edges sharded
     across the mesh (`dist_pose_graph`).

The whole pipeline is exercised on the virtual 8-device CPU mesh by
tests/test_sequence.py (trajectory parity vs single-device `run_slam`) and by
`parallel.dryrun` / `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..core.config import MatchConfig, SiftConfig
from ..optim import ba
from . import dist_ba, dist_pose_graph, dp

__all__ = [
    "SequenceFeatures", "extract_sequence_dp", "make_distributed_ba",
    "run_slam_distributed",
]


class _FrameShim(NamedTuple):
    """Minimal Features stand-in for one frame (desc/mask on device)."""
    desc: jax.Array  # [1, K, 128]
    mask: jax.Array  # [1, K]


class SequenceFeatures(NamedTuple):
    """Whole-sequence feature store: coordinates host-resident (bookkeeping
    consumes them); descriptors device-resident while the store fits the
    HBM budget, host-resident beyond it (long sequences would otherwise grow
    device memory linearly with T — VERDICT r2 weak #6).  Host-resident
    descriptors upload per frame in `frame_feats` (~K*128 bytes, enqueued
    asynchronously ahead of the match dispatch by the tracking loop's
    speculative pipelining)."""

    desc: object      # [T, K, 128] uint8 — jax.Array (device) or np.ndarray
    mask_dev: object  # [T, K] bool — same residency as desc
    x: np.ndarray     # [T, K] float32, host
    y: np.ndarray     # [T, K]
    mask: np.ndarray  # [T, K] bool, host

    def frame_feats(self, t: int) -> _FrameShim:
        if isinstance(self.desc, np.ndarray):
            return _FrameShim(
                desc=jnp.asarray(self.desc[t : t + 1]),
                mask=jnp.asarray(self.mask_dev[t : t + 1]),
            )
        return _FrameShim(desc=self.desc[t : t + 1], mask=self.mask_dev[t : t + 1])


def extract_sequence_dp(
    frames, cfg: SiftConfig, mesh: Mesh, axis: str = "data",
    chunk: Optional[int] = None, metrics=None,
    desc_hbm_budget: int = 1 << 30,
) -> SequenceFeatures:
    """Extract a [T, H, W] sequence data-parallel over `axis`.

    `chunk` (a multiple of the axis size; default 4 frames/device) bounds the
    pyramid working set per dispatch.  The tail chunk is padded with copies of
    the last frame and the padding dropped after extraction (fixed shapes).
    `desc_hbm_budget`: descriptor-store bytes kept device-resident; a longer
    sequence's store drops to host RAM and uploads per frame (bounds HBM for
    arbitrary T)."""
    import time as _time

    from ..pipeline.metrics import or_null

    metrics = or_null(metrics)
    n = mesh.shape[axis]
    T = len(frames)
    chunk = chunk or 4 * n
    chunk = max(n, (chunk // n) * n)
    frames = np.asarray(frames)

    # residency decided UP FRONT so peak device memory stays bounded: in
    # host mode each chunk's descriptors are pulled (and their device
    # buffers freed) before the next chunk extracts — the store never
    # accumulates on device
    host_mode = T * cfg.max_keypoints * 128 > desc_hbm_budget
    descs, masks_d, xs, ys, ms = [], [], [], [], []
    for lo in range(0, T, chunk):
        t0 = _time.perf_counter()
        blk = frames[lo : lo + chunk]
        pad = (-len(blk)) % n
        if pad:
            blk = np.concatenate([blk, np.repeat(blk[-1:], pad, axis=0)])
        feats = dp.extract_features_dp(jnp.asarray(blk), cfg, mesh, axis=axis)
        keep = len(blk) - pad
        if host_mode:
            descs.append(np.asarray(feats.desc[:keep]))
            masks_d.append(np.asarray(feats.mask[:keep]))
        else:
            descs.append(feats.desc[:keep])
            masks_d.append(feats.mask[:keep])
        x_h, y_h, m_h = jax.device_get(
            (feats.x[:keep], feats.y[:keep], feats.mask[:keep])
        )
        xs.append(x_h)
        ys.append(y_h)
        ms.append(m_h)
        metrics.event(
            "extract_chunk", lo=lo, frames=keep, devices=n,
            kp=int(m_h.sum()), ms=(_time.perf_counter() - t0) * 1e3,
        )
    cat = np.concatenate if host_mode else jnp.concatenate
    return SequenceFeatures(
        desc=cat(descs), mask_dev=cat(masks_d),
        x=np.concatenate(xs), y=np.concatenate(ys), mask=np.concatenate(ms),
    )


def make_distributed_ba(mesh: Mesh):
    """BA runner for `run_slam(ba_fn=...)`: partitions the window's map
    points/observations over ALL mesh devices and runs the psum'd Schur solve
    (`dist_ba.run_ba_distributed`).  Returns full (unpartitioned) BAState."""
    devs = mesh.devices.reshape(-1)
    flat = Mesh(devs, axis_names=("ba",))
    n = len(devs)

    def run(prob: ba.BAProblem, iters: int, n_cg: int) -> ba.BAState:
        sprob = dist_ba.partition_problem(prob, n)
        state, _ = dist_ba.run_ba_distributed(
            sprob, flat, axis="ba", iters=iters, n_cg=n_cg
        )
        # un-partition points: contiguous blocks by the same linspace bounds
        n_pts = prob.points.shape[0]
        bounds = np.linspace(0, n_pts, n + 1).astype(int)
        pts = np.zeros((n_pts, 3), np.float32)
        pts_s = np.asarray(state.points)
        for s in range(n):
            lo, hi = bounds[s], bounds[s + 1]
            pts[lo:hi] = pts_s[s, : hi - lo]
        return ba.BAState(
            cams=state.cams, points=jnp.asarray(pts),
            lam=state.lam, cost=state.cost,
        )

    return run


def _pose_graph_refine(result, mesh: Mesh, iters: int = 10,
                       loop_weight: float = 8.0):
    """Distributed Sim(3) pose-graph refinement over the keyframe chain
    (config 5's second half), edges sharded over the mesh.

    Monocular drift is dominated by SCALE drift, so the graph optimizes
    7-DoF (pose + scale) per keyframe — the classic monocular loop-closure
    formulation.  Edges: (a) odometry — consecutive + skip-1 keyframe
    relative poses measured at the windowed-BA optimum with relative scale 1
    (they hold the chain's local shape); (b) LOOP CLOSURES — measured
    relative Sim(3) transforms from `run_slam`'s revisit detection
    (`SlamResult.loop_edges`: 3D-3D similarity registration of the revisit
    pair's duplicated map points, which observes the accumulated relative
    scale).  Without loops the odometry residuals are ~0 and a converged
    trajectory is left unchanged.

    The optimized (s, R, t) per keyframe folds back to SE(3) as
    (R, t / s); corrections are propagated to the in-between frames by
    re-anchoring each non-keyframe pose to its preceding keyframe
    (T_t <- T_t . T_kf_old^-1 . T_kf_new)."""
    from ..geometry import pose as P
    from ..optim import pose_graph as pg

    kfs = result.keyframes
    if kfs is None or len(kfs) < 3:
        return result
    poses6 = jnp.asarray(np.stack([k.pose for k in kfs]))
    R0, t0 = P.exp_se3(poses6)
    poses = pg.srt_to_sim7(jnp.ones(len(kfs)), R0, t0)
    ei, ej = [], []
    for i in range(len(kfs) - 1):
        ei.append(i)
        ej.append(i + 1)
        if i + 2 < len(kfs):
            ei.append(i)
            ej.append(i + 2)
    ei = jnp.asarray(ei, jnp.int32)
    ej = jnp.asarray(ej, jnp.int32)
    Rr, tr = P.relative(R0[ei], t0[ei], R0[ej], t0[ej])
    t_meas = pg.srt_to_sim7(jnp.ones(ei.shape[0]), Rr, tr)
    weight = jnp.ones(ei.shape[0])

    loops = [e for e in (result.loop_edges or []) if e[1] < len(kfs)]
    if loops:
        ei = jnp.concatenate([ei, jnp.asarray([e[0] for e in loops], jnp.int32)])
        ej = jnp.concatenate([ej, jnp.asarray([e[1] for e in loops], jnp.int32)])
        t_meas = jnp.concatenate(
            [t_meas, jnp.asarray(np.stack([e[2] for e in loops]), jnp.float32)]
        )
        # information-proportional edge weights: a loop verified by more PnP
        # inliers is a better-conditioned measurement
        weight = jnp.concatenate(
            [weight, jnp.asarray(
                [loop_weight * e[3] / 80.0 for e in loops], jnp.float32)]
        )

    graph = pg.Sim3PoseGraph(
        poses=poses, edge_i=ei, edge_j=ej, t_meas=t_meas, weight=weight,
    )
    flat = Mesh(mesh.devices.reshape(-1), axis_names=("pg",))
    out, _ = dist_pose_graph.optimize_pose_graph_sim3_distributed(
        graph, flat, axis="pg", iters=iters
    )
    s_f, R_f, t_f = pg.sim7_to_srt(jnp.asarray(out.poses))
    # fold scale into SE(3): x_cam = s R x + t  <=>  x_cam/s = R x + t/s —
    # the camera center and orientation of [R, t/s]
    new_poses = np.asarray(
        P.log_se3(R_f, t_f / s_f[..., None]), np.float32
    )

    # propagate each keyframe's correction to the frames it anchors:
    # T_t <- (T_t . T_kf_old^-1) . T_kf_new, batched over all frames
    old_poses = np.stack([k.pose for k in kfs])
    kf_rows = np.asarray([k.frame_idx for k in kfs])
    T_total = len(result.trajectory)
    anchor = np.maximum(np.searchsorted(kf_rows, np.arange(T_total), "right") - 1, 0)
    Rt, tt = P.exp_se3(jnp.asarray(result.trajectory))
    Ro, to = P.exp_se3(jnp.asarray(old_poses[anchor]))
    Rn, tn = P.exp_se3(jnp.asarray(new_poses[anchor]))
    Rrel, trel = P.compose(Rt, tt, *P.inverse(Ro, to))
    Rtn, ttn = P.compose(Rrel, trel, Rn, tn)
    traj_new = np.array(P.log_se3(Rtn, ttn), np.float32)  # writable copy
    traj_new[kf_rows] = new_poses  # keyframe rows take the PG result exactly
    result.trajectory[:] = traj_new
    for i, k in enumerate(kfs):
        k.pose = new_poses[i]
    return result


def run_slam_distributed(
    frames, intr, cfg: SiftConfig, mcfg: MatchConfig, scfg, mesh: Mesh,
    data_axis: str = "data", chunk: Optional[int] = None,
    pose_graph: bool = True, metrics=None,
):
    """The config-5 end-to-end pipeline (see module docstring).

    Produces a `pipeline.slam.SlamResult` matching single-device `run_slam`
    up to float-reduction order (tests assert trajectory parity on the
    virtual 8-device mesh).  `metrics`: per-host JSONL stream (SURVEY §5.5)."""
    from ..pipeline import slam
    from ..pipeline.metrics import or_null

    m = or_null(metrics)
    m.event("sequence_start", frames=len(frames),
            devices=int(np.prod(list(mesh.shape.values()))))
    seq = extract_sequence_dp(
        frames, cfg, mesh, axis=data_axis, chunk=chunk, metrics=metrics
    )
    result = slam.run_slam(
        frames, intr, cfg, mcfg, scfg,
        features=seq, ba_fn=make_distributed_ba(mesh), metrics=metrics,
    )
    if pose_graph:
        result = _pose_graph_refine(result, mesh)
    m.event("sequence_done", keyframes=len(result.keyframe_indices),
            map_pts=int(result.map_mask.sum()))
    return result
