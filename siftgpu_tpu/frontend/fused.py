"""Fused orientation + descriptor path built on `ops/kp_engine.py`.

Production TPU path for the `GetFeatureOrientations` -> descriptor stages
(SURVEY.md §3.1 ⚠): one window DMA per keypoint feeds both the 36-bin
orientation histogram and the per-orientation descriptor gradient sampling,
all inside one Pallas kernel.  The separate `orient.compute_orientations` +
`describe.compute_descriptors` pipeline remains the CPU / golden path; this
module must produce the same results up to bf16 sampling tolerance
(tests/test_kp_engine.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import SiftConfig
from ..ops import kp_engine
from . import describe
from .detect import OctaveKeypoints
from .orient import GradStack

__all__ = ["orient_describe_fused"]


def orient_describe_fused(
    grads: GradStack, kp: OctaveKeypoints, cfg: SiftConfig,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (theta [B, K*n], valid [B, K*n], desc uint8 [B, K*n, 128]) in
    the same keypoint-major / orientation-minor layout as the unfused path
    (`extract.octave_candidates`)."""
    B, K = kp.y.shape
    S = grads.gx.shape[1]
    Hp, Wp = grads.gx.shape[-2:]
    n = cfg.max_orientations
    G2 = cfg.descriptor_grid ** 2

    planes_x = grads.gx.reshape(B * S, Hp, Wp)
    planes_y = grads.gy.reshape(B * S, Hp, Wp)
    b_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32)[:, None], K, axis=1)
    plane = (b_idx * S + (kp.grad_level - 1)).reshape(B * K)

    theta, haspk, sgx, sgy = kp_engine.orient_sample(
        planes_x, planes_y, plane,
        kp.y.reshape(B * K), kp.x.reshape(B * K), kp.sigma.reshape(B * K),
        cfg, mask=kp.mask.reshape(B * K),
        y0g=grads.y0, global_h=grads.global_h, w_true=grads.w,
        interpret=interpret,
    )

    theta = theta.reshape(B, K, n)
    valid = haspk.reshape(B, K, n) & kp.mask[..., None]
    # slot 0 fallback: degenerate histogram still yields one theta=0 keypoint
    valid = valid.at[..., 0].set(kp.mask)

    theta2 = theta.reshape(B, K * n)
    desc = describe.bin_descriptors(
        sgx.reshape(B, K * n, G2), sgy.reshape(B, K * n, G2), theta2, cfg
    )
    return theta2, valid.reshape(B, K * n), desc
