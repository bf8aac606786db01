"""Data-parallel extraction/matching over the `data` mesh axis.

The `MultiThreadSIFT` thread-per-GPU / image-list analog (SURVEY.md §2.3 DP
row ⚠) — here it is just a sharding annotation: the whole front end is batched
with the frame axis outermost, so `jit` + NamedSharding partitions frames
across devices and XLA inserts nothing but the final gather (if any).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..core.config import SiftConfig
from ..frontend.extract import Features, extract_features

__all__ = ["extract_features_dp"]


def extract_features_dp(
    images: jax.Array, cfg: SiftConfig, mesh: Mesh, axis: str = "data"
) -> Features:
    """images: [B, H, W] with B divisible by the `axis` size.  Returns
    Features sharded along the batch axis (kept device-resident)."""
    sharding = NamedSharding(mesh, P(axis))
    images = jax.device_put(images, sharding)
    fn = jax.jit(
        partial(extract_features, cfg=cfg),
        in_shardings=sharding,
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    return fn(images)
