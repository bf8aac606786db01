#!/usr/bin/env python
"""Probe: bin_descriptors formulations (the ~1.8 ms isolated XLA piece of the
orient+desc stage).  Variants of the orientation soft-assign + cell
contraction, timed queue-amortized at the production shape.

Usage: python scripts/probe_bin.py [K2 [B [iters]]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from siftgpu_tpu.core.config import SiftConfig
    from siftgpu_tpu.frontend import describe

    args = [int(a) for a in sys.argv[1:]]
    K2 = args[0] if len(args) > 0 else 16384
    B = args[1] if len(args) > 1 else 4
    iters = args[2] if len(args) > 2 else 60

    cfg = SiftConfig(height=480, width=640)
    G2 = cfg.descriptor_grid ** 2
    NB = cfg.descriptor_bins
    D = cfg.descriptor_width
    G = cfg.descriptor_grid
    rng = np.random.default_rng(0)
    sgx = jnp.asarray(rng.standard_normal((B, K2, G2)).astype(np.float32))
    sgy = jnp.asarray(rng.standard_normal((B, K2, G2)).astype(np.float32))
    theta = jnp.asarray(
        rng.uniform(0, 2 * np.pi, (B, K2)).astype(np.float32))

    _TWO_PI = describe._TWO_PI
    _, wrc_np, gw_np = describe._grid_constants(
        G, D, cfg.descriptor_samples_per_cell)

    # ---- variant bodies (single chunk [B, C, G2] -> [B, C, 128]) ----
    def chunk_v0(cx, cy, cth):
        return describe._bin_chunk(cx, cy, cth, cfg)

    def _mag_ob(cx, cy, cth):
        gwf = jnp.asarray(gw_np).reshape(G2)
        mag = jnp.sqrt(cx * cx + cy * cy) * gwf
        ang = (jnp.arctan2(cy, cx) - cth[..., None]) % _TWO_PI
        return mag, ang * (NB / _TWO_PI)

    def chunk_tent(cx, cy, cth):
        """Circular-tent weights; no one_hot, same adjacent-bin weights."""
        Bc, C, _ = cx.shape
        wrc = jnp.asarray(wrc_np)
        mag, ob = _mag_ob(cx, cy, cth)
        bins = jnp.arange(NB, dtype=jnp.float32)
        ad = jnp.abs(ob[..., None] - bins)
        w = jnp.maximum(1.0 - jnp.minimum(ad, NB - ad), 0.0)
        mo = (mag[..., None] * w).reshape(Bc, C, G, G, NB)
        desc = jnp.einsum(
            "bkijo,ir,jc->bkrco", mo, wrc, wrc,
            precision=jax.lax.Precision.HIGHEST,
        )
        return desc.reshape(Bc, C, D * D * NB)

    # W2[g, r*D+c] = wr[i(g), r] * wc[j(g), c]: ONE G2-contraction on the MXU
    W2_np = np.einsum("ir,jc->ijrc", wrc_np, wrc_np).reshape(G2, D * D)

    def chunk_tent_w2(cx, cy, cth):
        Bc, C, _ = cx.shape
        mag, ob = _mag_ob(cx, cy, cth)
        bins = jnp.arange(NB, dtype=jnp.float32)[:, None]
        ad = jnp.abs(ob[..., None, :] - bins)        # [B, C, NB, G2]
        w = jnp.maximum(1.0 - jnp.minimum(ad, NB - ad), 0.0)
        mo = mag[..., None, :] * w                   # [B, C, NB, G2]
        desc = jax.lax.dot_general(
            mo, jnp.asarray(W2_np),
            (((3,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )                                            # [B, C, NB, DD]
        return jnp.swapaxes(desc, -1, -2).reshape(Bc, C, D * D * NB)

    def chunk_tent_w2_bf16(cx, cy, cth):
        Bc, C, _ = cx.shape
        mag, ob = _mag_ob(cx, cy, cth)
        bins = jnp.arange(NB, dtype=jnp.float32)[:, None]
        ad = jnp.abs(ob[..., None, :] - bins)
        w = jnp.maximum(1.0 - jnp.minimum(ad, NB - ad), 0.0)
        mo = (mag[..., None, :] * w).astype(jnp.bfloat16)
        desc = jax.lax.dot_general(
            mo, jnp.asarray(W2_np, jnp.bfloat16),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.swapaxes(desc, -1, -2).reshape(Bc, C, D * D * NB)

    def chunk_onehot_w2(cx, cy, cth):
        """Current one-hot weights, single G2 contraction."""
        Bc, C, _ = cx.shape
        mag, ob = _mag_ob(cx, cy, cth)
        o0 = jnp.clip(jnp.floor(ob).astype(jnp.int32), 0, NB - 1)
        fo = ob - jnp.floor(ob)
        oh0 = jax.nn.one_hot(o0, NB, dtype=jnp.float32, axis=-1)
        oh1 = jax.nn.one_hot((o0 + 1) % NB, NB, dtype=jnp.float32, axis=-1)
        mo = (mag * (1.0 - fo))[..., None] * oh0 + (mag * fo)[..., None] * oh1
        mo = jnp.swapaxes(mo, -1, -2)                # [B, C, NB, G2]
        desc = jax.lax.dot_general(
            mo, jnp.asarray(W2_np),
            (((3,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.swapaxes(desc, -1, -2).reshape(Bc, C, D * D * NB)

    def wrap(chunk_fn, chunk=512):
        def full(sgx, sgy, theta):
            Bc, K, _ = sgx.shape
            nc = K // chunk

            def to_chunks3(a):
                return jnp.moveaxis(a.reshape(Bc, nc, chunk, G2), 1, 0)

            args = (to_chunks3(sgx), to_chunks3(sgy),
                    jnp.moveaxis(theta.reshape(Bc, nc, chunk), 1, 0))

            out = jax.lax.map(lambda a: chunk_fn(*a), args)
            out = jnp.moveaxis(out, 0, 1).reshape(Bc, nc * chunk, -1)
            return describe.finalize_descriptors(out, cfg)

        return jax.jit(full)

    variants = {
        "v0_current_c512": wrap(chunk_v0, 512),
        "v1_tent_c512": wrap(chunk_tent, 512),
        "v2_tent_w2_c512": wrap(chunk_tent_w2, 512),
        "v2_tent_w2_c1024": wrap(chunk_tent_w2, 1024),
        "v3_tent_w2_bf16_c512": wrap(chunk_tent_w2_bf16, 512),
        "v3_tent_w2_bf16_c2048": wrap(chunk_tent_w2_bf16, 2048),
        "v4_onehot_w2_c512": wrap(chunk_onehot_w2, 512),
    }

    ref = None
    for name, fn in variants.items():
        out = fn(sgx, sgy, theta)
        o = np.asarray(out)
        if ref is None:
            ref = o.astype(np.int32)
            mism = 0
        else:
            mism = int((np.abs(o.astype(np.int32) - ref) > 1).mean() * 1e6)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(sgx, sgy, theta) for _ in range(iters)]
            np.asarray(outs[-1].ravel()[0:1])
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name:24s} {best * 1e3:7.3f} ms  mismatch>1: {mism} ppm")


if __name__ == "__main__":
    main()
