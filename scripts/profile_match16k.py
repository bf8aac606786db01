#!/usr/bin/env python
"""Whole-program ablation of the 16k x 16k fused-match path (real TPU, solo).

VERDICT r4 task 1: the fused kernel alone measures ~1.8 ms but the full
jitted program 5.45 ms, and the gap does NOT decompose additively — so this
script times the FULL program with pieces removed one at a time (same jit,
same deep-queue protocol), plus kernel-layout variants:

  full               match_descriptors, max_match = N (r4 bench shape)
  full/topk          match_descriptors, max_match = 4096 (production shape,
                     exercises the top-k compaction added in r5)
  kernel+norms       _u8_parts + match_best2, no finalize
  kernel only        match_best2 on prepped rn/mask inputs
  finalize only      _finalize on prepped reduction vectors
  kernel notrans     variant: d1 stays [N1, 128], the kernel contracts
                     dot_general(((1,), (1,))) — no XLA transpose prologue
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))


def _sync(x):
    np.asarray(x.ravel()[0:1])


def bench(fn, args, iters=40, reps=4, name=""):
    r = fn(*args)
    _sync(r[0] if isinstance(r, tuple) else r)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(iters)]
        last = rs[-1]
        _sync(last[0] if isinstance(last, tuple) else last)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{name:44s} {best:8.3f} ms", file=sys.stderr)
    return best


def main():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from siftgpu_tpu.core.config import MatchConfig
    from siftgpu_tpu.frontend import match as M
    from siftgpu_tpu.ops import match_kernel as MK

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.default_rng(3)
    d0 = jax.device_put(jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8)))
    d1 = jax.device_put(jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8)))
    mask = jnp.ones(N, bool)

    cfg_full = MatchConfig(max_sift=N, max_match=N)
    cfg_prod = MatchConfig(max_sift=N, max_match=4096)

    f_full = jax.jit(lambda a, b: M.match_descriptors_impl(a, b, cfg=cfg_full))
    f_prod = jax.jit(lambda a, b: M.match_descriptors_impl(a, b, cfg=cfg_prod))
    bench(f_full, (d0, d1), name=f"full {N} max_match={N}")
    bench(f_prod, (d0, d1), name=f"full {N} max_match=4096 (top-k)")

    # kernel + norms (no finalize)
    def kn(a, b):
        _, rn0 = M._u8_parts(a)
        _, rn1 = M._u8_parts(b)
        return MK.match_best2(a, b, rn0, rn1,
                              jnp.ones(a.shape[0], bool),
                              jnp.ones(b.shape[0], bool))
    f_kn = jax.jit(kn)
    bench(f_kn, (d0, d1), name="kernel + norms")

    # kernel only (prepped norms/masks)
    _, rn0 = M._u8_parts(d0)
    _, rn1 = M._u8_parts(d1)
    rn0, rn1 = jax.device_put(rn0), jax.device_put(rn1)
    f_k = jax.jit(lambda a, b, x, y: MK.match_best2(a, b, x, y, mask, mask))
    bench(f_k, (d0, d1, rn0, rn1), name="kernel only")

    # finalize only, both shapes
    bs, ss, bj, ci = f_k(d0, d1, rn0, rn1)
    bs, ss, bj, ci = map(jax.device_put, (bs, ss, bj, ci))
    f_fin = jax.jit(lambda a, b, c, d: M._finalize(a, b, c, d, cfg_full))
    f_fin_p = jax.jit(lambda a, b, c, d: M._finalize(a, b, c, d, cfg_prod))
    bench(f_fin, (bs, ss, bj, ci), name=f"finalize only max_match={N}")
    bench(f_fin_p, (bs, ss, bj, ci), name="finalize only max_match=4096")

    # norms only
    f_n = jax.jit(lambda a: M._u8_parts(a)[1])
    bench(f_n, (d0,), name="norms only (one side)")

    # ---- kernel variant: untransposed d1, in-kernel rhs-T contraction ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TM, TN = 512, 2048
    _BIG, _NEG = 2**30, float("-inf")

    def _kern_nt(d0_ref, d1_ref, rn0_ref, rn1_ref,
                 bs_ref, ss_ref, bj_ref, ci_ref,
                 rbest_s, rsec_s, rj_s, cval_s, cidx_s, *, ni, nj):
        i = pl.program_id(0)
        j = pl.program_id(1)
        dot = jax.lax.dot_general(
            d0_ref[...], d1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sim = (dot * rn1_ref[...]) * rn0_ref[...]
        r1 = jnp.max(sim, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
        ridx = jnp.min(jnp.where(sim == r1, cols, _BIG), axis=1, keepdims=True)
        r2 = jnp.max(jnp.where(cols == ridx, _NEG, sim), axis=1, keepdims=True)
        gidx = ridx + j * TN

        @pl.when(j == 0)
        def _():
            rbest_s[...] = r1
            rsec_s[...] = r2
            rj_s[...] = gidx

        @pl.when(j > 0)
        def _():
            best, sec, bj_ = rbest_s[...], rsec_s[...], rj_s[...]
            rbest_s[...] = jnp.maximum(best, r1)
            rsec_s[...] = jnp.maximum(jnp.maximum(sec, r2), jnp.minimum(best, r1))
            rj_s[...] = jnp.where(r1 > best, gidx, bj_)

        @pl.when(j == nj - 1)
        def _():
            bs_ref[...] = rbest_s[...]
            ss_ref[...] = rsec_s[...]
            bj_ref[...] = rj_s[...]

        c1 = jnp.max(sim, axis=0, keepdims=True)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0)
        ci = jnp.min(jnp.where(sim == c1, rows, _BIG), axis=0, keepdims=True)
        ci = ci + i * TM

        @pl.when(i == 0)
        def _():
            cval_s[j] = c1
            cidx_s[j] = ci

        @pl.when(i > 0)
        def _():
            old_v, old_i = cval_s[j], cidx_s[j]
            upd = c1 > old_v
            cval_s[j] = jnp.where(upd, c1, old_v)
            cidx_s[j] = jnp.where(upd, ci, old_i)

        ci_ref[...] = cidx_s[j]

    @jax.jit
    def f_nt(a, b, x, y):
        ab = a.astype(jnp.bfloat16)
        bb = b.astype(jnp.bfloat16)
        ni, nj = N // TM, N // TN
        return pl.pallas_call(
            functools.partial(_kern_nt, ni=ni, nj=nj),
            grid=(ni, nj),
            in_specs=[
                pl.BlockSpec((TM, 128), lambda i, j: (i, 0)),
                pl.BlockSpec((TN, 128), lambda i, j: (j, 0)),
                pl.BlockSpec((TM, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((1, TN), lambda i, j: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((TM, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((TM, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((TM, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((1, TN), lambda i, j: (0, j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, 1), jnp.float32),
                jax.ShapeDtypeStruct((N, 1), jnp.float32),
                jax.ShapeDtypeStruct((N, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, N), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((TM, 1), jnp.float32),
                pltpu.VMEM((TM, 1), jnp.float32),
                pltpu.VMEM((TM, 1), jnp.int32),
                pltpu.VMEM((nj, 1, TN), jnp.float32),
                pltpu.VMEM((nj, 1, TN), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(ab, bb, x.reshape(-1, 1), y.reshape(1, -1))

    try:
        r = f_nt(d0, d1, rn0, rn1)
        ref = f_k(d0, d1, rn0, rn1)
        ok = np.allclose(np.asarray(r[0][:, 0]), np.asarray(ref[0]))
        okj = np.array_equal(np.asarray(r[2][:, 0]), np.asarray(ref[2]))
        okc = np.array_equal(np.asarray(r[3][0]), np.asarray(ref[3]))
        print(f"notrans parity: vals {ok} argj {okj} coli {okc}", file=sys.stderr)
        bench(f_nt, (d0, d1, rn0, rn1), name="kernel notrans FULL (row+col)")

        # full notrans program: norms + kernel + finalize (production top-k)
        def full_nt(a, b):
            _, x = M._u8_parts(a)
            _, y = M._u8_parts(b)
            bs_, ss_, bj_, ci_ = f_nt(a, b, x, y)
            return M._finalize(bs_[:, 0], ss_[:, 0], bj_[:, 0], ci_[0], cfg_prod)
        f_full_nt = jax.jit(full_nt)
        bench(f_full_nt, (d0, d1), name="FULL notrans+norms+topk-finalize")
    except Exception as e:
        print(f"notrans variant failed: {type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
