"""Descriptor-only mode: compute descriptors at a PRESET keypoint list.

`SiftGPU::SetKeypointList` + `RunSIFT(num, keys, ...)` analog (SURVEY.md §2.1
⚠): downstream tools (e.g. matching against an existing map) supply (x, y,
sigma, theta) and only need the 128-D descriptors.  Each keypoint is assigned
to the octave where its scale is octave-local in [sigma0, 2*sigma0); every
octave processes the full (masked) list — fixed shapes, no host compaction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.config import SiftConfig
from . import describe, orient, pyramid
from .extract import Features

__all__ = ["describe_at_keypoints"]


@partial(jax.jit, static_argnums=2)
def describe_at_keypoints(
    images: jax.Array, keypoints: jax.Array, cfg: SiftConfig
) -> Features:
    """images: [B, H, W]; keypoints: [B, K, 4] (x, y, sigma, theta) in image
    coords.  Returns Features with descriptors computed at the given points
    (mask = keypoint has a valid octave assignment)."""
    B, K = keypoints.shape[:2]
    x, y, sig, th = (keypoints[..., i] for i in range(4))
    S = cfg.dog_levels

    pyr = pyramid.build_pyramid(images, cfg)

    # octave assignment: sigma / 2^(o + fo) in [sigma0, 2 sigma0)
    ratio = jnp.log2(jnp.maximum(sig, 1e-6) / cfg.sigma0) - cfg.first_octave
    oct_f = jnp.floor(ratio)
    octave = jnp.clip(oct_f, 0, cfg.octaves - 1).astype(jnp.int32)
    valid = (sig > 0) & (oct_f >= 0) & (oct_f < cfg.octaves)

    desc = jnp.zeros((B, K, cfg.descriptor_dim), jnp.uint8)
    for o in range(cfg.octaves):
        sel = (octave == o) & valid
        scale = cfg.octave_scale(o)
        shift = 0.5 if cfg.lowe_origin else 0.0
        xo = x / scale - shift
        yo = y / scale - shift
        so = sig / scale
        sigma_local = jnp.clip(so, cfg.sigma0 * 0.5, cfg.sigma0 * 4.0)
        lvl = jnp.clip(
            jnp.round(S * jnp.log2(jnp.maximum(sigma_local, 1e-6) / cfg.sigma0)),
            1, S,
        ).astype(jnp.int32)
        grads = orient.gradient_stack(pyr[o].gauss, cfg)
        d = describe.compute_descriptors(grads, yo, xo, sigma_local, th, lvl, cfg)
        desc = jnp.where(sel[..., None], d, desc)

    return Features(
        x=x, y=y, sigma=sig, theta=th,
        response=jnp.zeros_like(x), octave=octave,
        desc=desc, mask=valid,
    )
