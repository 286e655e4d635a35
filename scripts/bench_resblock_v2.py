"""Prototype benchmark: fused-resblock kernel v2 (slice-based, bf16 carry)
vs the shipping v1 (roll-based, f32 carry).

v1 carries f32 buffers because pltpu.roll only handles 32-bit data, which
forces per-tap f32 rolls + f32->bf16 casts and 2-pass rnd() rounding.
v2 removes every roll: each conv takes static unaligned slices from a
haloed buffer (measured supported on this Mosaic, incl. as dot operands),
and carries activations in the compute dtype directly — the bf16 carry IS
the unfused path's rounding, so exactness is preserved with ~4x fewer
VPU passes per conv.

Usage: python scripts/bench_resblock_v2.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rvc_tpu.ops.pallas_resblock import (TILE, _conv_taps, _fused_call,
                                         fused_resblock1)


def _align8(n):
    return n + (-n) % 8


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _fused_call_v2(x, w_cat, b_cat, *, meta, interpret=False):
    """Slice-based fused chain. meta: (conv_meta, T, SL, heights) where
    heights[c] is the (8-aligned) buffer height entering conv c (heights[0]
    is the DMA'd input height) and heights[6] == TILE."""
    conv_meta, T, SL, heights = meta
    B, Tpad, CL = x.shape
    n_tiles = (Tpad - (heights[0] - TILE)) // TILE
    dtype = x.dtype
    import ml_dtypes

    slope = float(ml_dtypes.bfloat16(0.1)) if dtype == jnp.bfloat16 else 0.1

    def kernel(x_hbm, w_ref, b_ref, out_ref, xt, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * TILE, heights[0]), :], xt, sem)
        cp.start()
        cp.wait()

        tile_org = ti * TILE  # extended coord of buffer row 0 at chain start

        def conv(buf, ci, org, H_out):
            n, offs, lr = conv_meta[ci]
            acc = None
            for j in range(n):
                sl = buf[offs[j]:offs[j] + H_out, :] if (
                    offs[j] or buf.shape[0] != H_out) else buf
                contrib = jnp.dot(sl, w_ref[ci * MAXN + j],
                                  preferred_element_type=jnp.float32)
                acc = contrib if acc is None else acc + contrib
            acc = acc + b_ref[ci, :][None, :]
            y = acc.astype(dtype)
            # zero rows outside the sequence (torch zero-pad semantics);
            # out row t sits at extended coord org + lr + t
            pos = jax.lax.broadcasted_iota(jnp.int32, (H_out, 1), 0) + (
                org + lr + tile_org - SL)
            keep = ((pos >= 0) & (pos < T)).astype(dtype)
            return y * keep

        h = xt[:]
        org = 0
        for p in range(3):
            ci_a, ci_b = 2 * p, 2 * p + 1
            lr_a = conv_meta[ci_a][2]
            lr_b = conv_meta[ci_b][2]
            t1 = conv(_lrelu(h, slope), ci_a, org, heights[ci_a + 1])
            t2 = conv(_lrelu(t1, slope), ci_b, org + lr_a, heights[ci_b + 1])
            # residual: h row (s_p + t) has the same coord as t2 row t
            s_p = lr_a + lr_b
            h = h[s_p:s_p + heights[ci_b + 1], :] + t2
            org += lr_a + lr_b
        out_ref[0] = h[:TILE, :]

    n_convs = len(conv_meta)
    MAXN = max(m[0] for m in conv_meta)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, CL), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, CL), dtype),
        scratch_shapes=[
            pltpu.VMEM((heights[0], CL), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w_cat, b_cat)


def _lrelu(x, slope):
    return jnp.maximum(x, x * slope)


def fused_resblock1_v2(x, convs, S=1, interpret=False):
    B, T, CL = x.shape
    built = [_conv_taps(w, b, k, d, S) for (w, b, k, d) in convs]
    conv_meta = tuple(
        (len(offs), tuple(offs), lr) for (offs, _, _, lr) in built)
    SL = sum(m[2] for m in conv_meta)
    # heights, back to front: H after the chain = TILE
    hs = [TILE]
    for (n, offs, lr) in reversed(conv_meta):
        hs.append(_align8(hs[-1] + offs[-1]))
    heights = tuple(reversed(hs))
    MAXN = max(m[0] for m in conv_meta)
    dtype = x.dtype
    CLp = x.shape[-1]
    # pad tap table to (6*MAXN, CL, CL) so w_ref rows index statically
    w_rows = []
    for (offs, taps, _, _) in built:
        w_rows.append(taps)
        if taps.shape[0] < MAXN:
            w_rows.append(jnp.zeros((MAXN - taps.shape[0], CLp, CLp),
                                    taps.dtype))
    w_cat = jnp.concatenate(w_rows, axis=0).astype(dtype)
    b_cat = jnp.stack([
        jnp.zeros((CLp,), jnp.float32) if bb is None else bb.astype(jnp.float32)
        for (_, _, bb, _) in built])
    Tp = -(-T // TILE) * TILE
    xp = jnp.pad(x, ((0, 0), (SL, (heights[0] - TILE) + Tp - T - SL), (0, 0)))
    meta = (conv_meta, T, SL, heights)
    out = _fused_call_v2(xp, w_cat, b_cat, meta=meta, interpret=interpret)
    return out[:, :T]


def make_convs(rng, C, k, dils, dtype):
    convs = []
    for d in dils:
        for dd in (d, 1):
            w = jnp.asarray(rng.standard_normal((C, C, k)) * 0.05, jnp.float32)
            b = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)
            convs.append((w, b, k, dd))
    return convs


def timed(fn, *args, n1=3, n2=9):
    @functools.partial(jax.jit, static_argnums=(1,))
    def looped(xs, iters):
        def body(i, acc):
            x0 = xs[0] * (1.0 + 1e-6 * i.astype(jnp.float32)).astype(xs[0].dtype)
            y = fn(x0, *xs[1:])
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def wall(iters):
        float(looped(args, iters))
        t0 = time.perf_counter()
        float(looped(args, iters))
        return time.perf_counter() - t0

    t1, t2 = wall(n1), wall(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    B = 4
    # (label, T, C, S, k): decode stages of 48k_v2 at 4x18 s
    stages = [
        ("s0 C=256 k=3", 21600, 256, 1, 3),
        ("s0 C=256 k=11", 21600, 256, 1, 11),
        ("s1 C=128 k=3", 216000, 128, 1, 3),
        ("s1 C=128 k=7", 216000, 128, 1, 7),
        ("s1 C=128 k=11", 216000, 128, 1, 11),
        ("s2 C=64 S=2 k=11", 432000, 64, 2, 11),
        ("s3 C=32 S=4 k=11", 864000, 32, 4, 11),
    ]
    for label, T, C, S, k in stages:
        convs = make_convs(rng, C, k, (1, 3, 5), jnp.float32)
        Tpk = T // S
        CL = C * S
        x = jnp.asarray(rng.standard_normal((B, Tpk, CL)) * 0.3, jnp.float32
                        ).astype(dtype)
        y1 = fused_resblock1(x, convs, S=S)
        y2 = fused_resblock1_v2(x, convs, S=S)
        exact = bool((y1 == y2).all())
        err = float(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)
                            ).max())
        t1 = timed(lambda xx: fused_resblock1(xx, convs, S=S), x)
        t2 = timed(lambda xx: fused_resblock1_v2(xx, convs, S=S), x)
        print(f"{label:20s} v1 {t1*1e3:7.2f} ms  v2 {t2*1e3:7.2f} ms  "
              f"speedup {t1/t2:5.2f}x  exact={exact} maxerr={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
