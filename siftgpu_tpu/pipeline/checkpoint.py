"""Checkpoint / resume for the SLAM map and trajectory (SURVEY.md §5.4).

The reference persists only per-image `.sift` files; the SLAM back end is
stateful, so map + keyframe + trajectory state snapshots to NPZ.  The front
end is stateless per frame, which makes failure recovery = re-dispatch from
the last snapshot (SURVEY §5.3): `resume_slam` continues a sequence from a
checkpoint and reproduces the uncheckpointed tail.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from . import slam as slam_mod

__all__ = ["save_slam_state", "load_slam_state", "SlamCheckpoint"]


class SlamCheckpoint:
    def __init__(self, data: dict):
        self.data = data

    @property
    def next_frame(self) -> int:
        return int(self.data["next_frame"])


def save_slam_state(path: str, res: slam_mod.SlamResult, next_frame: int,
                    keyframes: Optional[List] = None) -> None:
    """Snapshot trajectory-so-far + map.  Keyframe features are stored so
    tracking can resume against the last keyframe."""
    if keyframes is None:
        keyframes = res.keyframes
    payload = dict(
        trajectory=res.trajectory,
        keyframe_indices=np.asarray(res.keyframe_indices, np.int64),
        map_points=res.map_points,
        map_mask=res.map_mask,
        num_tracked=np.asarray(res.num_tracked, np.int64),
        next_frame=np.asarray(next_frame, np.int64),
    )
    if keyframes:
        last = keyframes[-1]
        payload.update(
            kf_pose=last.pose,
            kf_frame_idx=np.asarray(last.frame_idx, np.int64),
            kf_x=last.kp["x"], kf_y=last.kp["y"],
            kf_desc=np.asarray(last.kp["desc"]),
            kf_mask=last.kp["mask"],
            kf_pt_ids=last.pt_ids,
        )
    # atomic publish: a crash mid-write (SURVEY §5.3 fault model) must never
    # leave a truncated checkpoint — write to a sibling tmp file, then rename
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_slam_state(path: str) -> SlamCheckpoint:
    with np.load(path) as z:
        return SlamCheckpoint({k: z[k] for k in z.files})
