"""Pallas TPU kernel: one fused HiFiGAN ResBlock (6 convs) per dispatch.

The NSF decoder's resblock stacks (reference lib/infer_pack/modules.py
ResBlock1:220-301, consumed by GeneratorNSF models.py:549-563) are the
dominant sample-rate compute. Unfused, every conv round-trips the
(B, T, C) activation through HBM: 12 reads + 12 writes per resblock
chain. This kernel keeps one tile of the sequence in VMEM and runs the
whole chain — leaky_relu → dilated conv → leaky_relu → conv → residual
add, three times — writing only the final tile back: 2 HBM transfers
instead of 24.

Design notes (TPU):
- Convs are expressed as per-tap matmuls: y[t] = Σ_j x[t + off_j] @ W_j
  with (tile, C)x(C, C) dots on the MXU. For space-to-depth-packed stages
  (C < 128; see models/layers._s2d_weight) the taps are the packed
  block-Toeplitz superchannel weights, so lane utilization is full either
  way. FLOPs are identical to the unfused form.
- Halos: the caller zero-pads the sequence by the chain's total left/right
  reach; each grid step DMAs tile+halo from HBM (overlapping windows are
  not expressible as a BlockSpec).
- Exactness: the unfused path zero-pads EVERY conv input at the sequence
  boundary, so layer outputs beyond the sequence are consumed as zeros.
  The kernel reproduces this with a positional mask after every conv
  (rows outside [0, T) are zeroed before being consumed) — fused and
  unfused outputs match everywhere, not just in the interior.
- Inference-only (no custom VJP); the training path keeps the unfused
  convs.
"""
from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# packed frames per grid step. 1024 measured 10-16% faster than 512 on the
# deep stages (fewer grid steps, longer matmuls vs halo overhead); r4
# sweep on the full synth dispatch: 2048 another ~3% over 1024
# (237.6 -> 231.1 ms, 8x12s). env override for tuning sweeps.
TILE = int(_os.environ.get("RVC_TPU_RESBLOCK_TILE", "2048"))

# backward (training) kernel tile — decoupled from the inference tile: the
# recompute-in-VMEM backward holds ~8 live L0b×CL f32 buffers plus the full
# dW accumulator, so its VMEM footprint scales with the tile where the
# forward's does not. 2048 exceeds the 128M VMEM budget at CL=256 (measured
# r4: 168M requested → compile error); 1024 is the largest green value and
# the one the 13.6 steps/s train bench was measured at.
BWD_TILE = int(_os.environ.get("RVC_TPU_RESBLOCK_TILE_BWD", "1024"))


def _conv_taps(w: jax.Array, b: jax.Array | None, k: int, d: int, S: int):
    """One conv's tap list for the kernel.

    Returns (offsets, taps (n, CL_in, CL_out), bias (CL,), left_reach).
    S > 1: the space-to-depth packed form (models/layers._s2d_weight) —
    stride-1 taps over superframes. S == 1: the dilated form, k taps at
    spacing d (same FLOPs as the conv).
    """
    padding = (k * d - d) // 2
    if S > 1:
        from ..models.layers import _s2d_weight

        W2, pl_, pr_ = _s2d_weight(w, S, d, padding)  # (S·O, S·I, Q)
        taps = jnp.transpose(W2, (2, 1, 0))  # (Q, CL_in, CL_out)
        offs = list(range(taps.shape[0]))
        bias = None if b is None else jnp.tile(b, S)
        return offs, taps, bias, pl_
    taps = jnp.transpose(w, (2, 1, 0))  # (k, I, O)
    offs = [j * d for j in range(k)]
    return offs, taps, b, padding


def _lrelu(x, slope):
    # max(x, s·x) == leaky_relu for 0 < s < 1; avoids a float compare,
    # which Mosaic cannot lower for packed bf16 vectors
    return jnp.maximum(x, x * slope)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _fused_call(x, w_cat, b_cat, *, meta, interpret=False):
    """meta: tuple of per-conv (n_taps, offsets tuple, left_reach) × 6,
    plus (T, SL, HR). Static so the kernel unrolls fully.

    All in-kernel buffers stay at the FIXED size TILE+SL+HR (Mosaic
    requires 8-aligned slice shapes, which shrinking per-conv slices
    violate): tap shifts are circular rolls, and the garbage that wraps
    around stays inside the halo frontier, which the final center crop
    never reads."""
    conv_meta, T, SL, HR = meta
    B, Tpad, CL = x.shape
    n_tiles = Tpad // TILE
    dtype = x.dtype
    L0 = TILE + SL + HR  # multiple of 8 by construction
    # The unfused path computes leaky_relu in the compute dtype: for bf16
    # activations the slope operand is bf16(0.1), and the product of two
    # bf16-exact values is exact in the f32 carry — so rounding the slope
    # through bf16 here makes fused == unfused bit-for-bit after the
    # subsequent astype(dtype).
    import ml_dtypes

    slope = float(ml_dtypes.bfloat16(0.1)) if dtype == jnp.bfloat16 else 0.1

    def kernel(x_hbm, w_ref, b_ref, out_ref, xt, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * TILE, L0), :], xt, sem)
        cp.start()
        cp.wait()

        # tile_org: global extended coordinate of this buffer's row 0; the
        # sequence occupies extended coords [SL, SL + T)
        tile_org = ti * TILE

        # Buffers are carried in f32: Mosaic's rotate only handles 32-bit
        # data. Values stay EXACTLY bf16-representable — dot inputs are cast
        # to the compute dtype and every conv/residual output is rounded
        # through it — so fused output == unfused bf16 output.
        def rnd(v):
            return v if dtype == jnp.float32 else v.astype(dtype).astype(
                jnp.float32)

        def conv(buf, ci, g, row0):
            # buf row t sits at extended coord tile_org + t + g; the conv
            # advances the frame by its left reach (output row t ↔ input
            # row t + lr)
            n, offs, lr = conv_meta[ci]
            acc = None
            for j in range(n):
                # left-shift by off expressed as the equivalent non-negative
                # roll (pltpu.roll rejects negative shifts)
                shifted = buf if offs[j] == 0 else pltpu.roll(
                    buf, L0 - offs[j], axis=0)
                contrib = jnp.dot(shifted.astype(dtype), w_ref[row0 + j],
                                  preferred_element_type=jnp.float32)
                acc = contrib if acc is None else acc + contrib
            acc = acc + b_ref[ci, :][None, :].astype(jnp.float32)
            y = rnd(acc)
            # zero rows outside the sequence: the unfused path's next conv
            # zero-pads its input there (torch same-padding semantics)
            pos = jax.lax.broadcasted_iota(jnp.int32, (L0, 1), 0) + (
                g + lr + tile_org - SL)
            keep = ((pos >= 0) & (pos < T)).astype(jnp.float32)
            return y * keep  # multiplicative mask (no bf16 select needed)

        h = xt[:].astype(jnp.float32)
        g = 0  # frame shift: coord of h[t] = tile_org + t + g
        row0 = 0
        for p in range(3):
            ci_a, ci_b = 2 * p, 2 * p + 1
            n_a, offs_a, lr_a = conv_meta[ci_a]
            n_b, offs_b, lr_b = conv_meta[ci_b]
            t = conv(_lrelu(h, slope), ci_a, g, row0)
            row0 += n_a
            t = conv(_lrelu(t, slope), ci_b, g + lr_a, row0)
            row0 += n_b
            # realign h to t's frame before the residual add
            h = rnd(pltpu.roll(h, L0 - (lr_a + lr_b), axis=0) + t)
            g += lr_a + lr_b
        # after the chain g == SL: h[t] ↔ coord tile_org + t + SL, so rows
        # [0, TILE) are exactly this tile's outputs
        out_ref[0] = h[:TILE, :].astype(dtype)

    total_taps = sum(m[0] for m in conv_meta)
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
            pltpu.VMEM((L0, CL), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_tiles * TILE * CL * CL * total_taps,
            bytes_accessed=(B * Tpad * CL + B * n_tiles * TILE * CL) * 2
            + total_taps * CL * CL * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_cat, b_cat)


# ---------------------------------------------------------------------------
# Backward kernel (training): recompute-in-VMEM chain VJP
# ---------------------------------------------------------------------------
#
# Why a hand-written backward: the train step is KERNEL-COUNT bound, not
# FLOP bound (measured r4: ~7.4k fused kernels × ~12 µs launch ≈ the whole
# 89 ms step; batch 4 → 8 leaves step time unchanged). XLA's vjp of the
# unfused chain emits ~40 kernels per resblock per direction; this kernel
# re-runs the 6-conv chain per tile inside VMEM (activations never touch
# HBM), then walks it backward — dx, all 6 dW and db in ONE launch.
#
# Tile-local correctness: each grid step owns final-output rows
# [ti·TILE, ti·TILE+TILE); the incoming cotangent is masked to ownership,
# so per-tile dW/db contributions sum exactly (loss = Σ_tiles loss_tile)
# and dx contributions are disjoint-by-construction per owned set — slabs
# overlap-add outside. Buffers are L0b = TILE + 2·(SL+SR) so circular-roll
# wrap garbage never reaches rows with nonzero cotangent (single-conv
# reach ≤ total chain reach).


def _lrelu_grad(x, slope):
    return jnp.where(x > 0, 1.0, slope)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _fused_bwd_call(xp, dyp, w_cat, b_cat, *, meta, interpret=False):
    """xp: (B, Tpad_b, CL) padded input (f32); dyp: (B, Tpad, CL)
    cotangent of the chain output (Tpad = n_tiles·BWD_TILE); w_cat: packed taps
    (total_taps, CL, CL); b_cat: (8, CL) packed biases. Returns
    (dx_slab (B, n_tiles, L0b, CL) f32, dW (total_taps, CL, CL) f32,
    db (8, CL) f32)."""
    conv_meta, T, SL, SR, slope = meta
    B, Tpad_b, CL = xp.shape
    HALO = SL + SR
    L0b = BWD_TILE + 2 * HALO + (-(BWD_TILE + 2 * HALO)) % 8
    n_tiles = (Tpad_b - (L0b - BWD_TILE)) // BWD_TILE
    total_taps = sum(m[0] for m in conv_meta)
    # g (frame shift) at each pair start, static
    g_pairs = []
    g = 0
    for p in range(3):
        g_pairs.append(g)
        g += conv_meta[2 * p][2] + conv_meta[2 * p + 1][2]

    def kernel(x_hbm, dy_hbm, w_ref, b_ref, dx_ref, dw_ref, db_ref, xt, dyt,
               sem, sem2):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * BWD_TILE, L0b), :], xt, sem)
        cp.start()
        cp2 = pltpu.make_async_copy(
            dy_hbm.at[bi, pl.ds(ti * BWD_TILE, BWD_TILE), :], dyt, sem2)
        cp2.start()
        cp.wait()
        cp2.wait()

        tile_org = ti * BWD_TILE

        @pl.when((bi == 0) & (ti == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def keep_for(g_arg, lr):
            pos = jax.lax.broadcasted_iota(jnp.int32, (L0b, 1), 0) + (
                g_arg + lr + tile_org - SL)
            return ((pos >= 0) & (pos < T)).astype(jnp.float32)

        def conv_fwd(buf, ci, g_arg, row0):
            n, offs, lr = conv_meta[ci]
            acc = None
            for j in range(n):
                shifted = buf if offs[j] == 0 else pltpu.roll(
                    buf, L0b - offs[j], axis=0)
                contrib = jnp.dot(shifted, w_ref[row0 + j],
                                  preferred_element_type=jnp.float32)
                acc = contrib if acc is None else acc + contrib
            # bias INCLUDED: it shifts the pre-activations, which moves the
            # leaky-relu kinks the backward pass differentiates through
            acc = acc + b_ref[ci, :][None, :]
            return acc * keep_for(g_arg, lr)

        # ---- forward recompute, storing pair inputs h_p and conv-a
        # outputs c1_p (post-mask, pre-lrelu of conv-b's input)
        h = xt[:].astype(jnp.float32)
        hs, c1s = [], []
        row0 = 0
        row0s = []
        for p in range(3):
            ci_a, ci_b = 2 * p, 2 * p + 1
            n_a, offs_a, lr_a = conv_meta[ci_a]
            n_b, offs_b, lr_b = conv_meta[ci_b]
            hs.append(h)
            row0s.append(row0)
            c1 = conv_fwd(_lrelu(h, slope), ci_a, g_pairs[p], row0)
            c1s.append(c1)
            row0 += n_a
            t2 = conv_fwd(_lrelu(c1, slope), ci_b, g_pairs[p] + lr_a, row0)
            row0 += n_b
            h = pltpu.roll(h, L0b - (lr_a + lr_b), axis=0) + t2

        # ---- ownership mask on the incoming cotangent
        row = jax.lax.broadcasted_iota(jnp.int32, (L0b, 1), 0)
        own = ((row < BWD_TILE) & (row + tile_org < T)).astype(jnp.float32)
        dF = jnp.pad(dyt[:].astype(jnp.float32),
                     ((0, L0b - BWD_TILE), (0, 0))) * own

        # ---- backward through the three pairs
        for p in range(2, -1, -1):
            ci_a, ci_b = 2 * p, 2 * p + 1
            n_a, offs_a, lr_a = conv_meta[ci_a]
            n_b, offs_b, lr_b = conv_meta[ci_b]
            s_p = lr_a + lr_b
            h_p, c1 = hs[p], c1s[p]
            u1 = _lrelu(h_p, slope)
            u2 = _lrelu(c1, slope)
            d_h_res = pltpu.roll(dF, s_p, axis=0)
            d_c2pre = dF * keep_for(g_pairs[p] + lr_a, lr_b)
            # conv-b weight/bias grads + input cotangent
            row0_b = row0s[p] + n_a
            d_u2 = None
            for j in range(n_b):
                shifted_u2 = u2 if offs_b[j] == 0 else pltpu.roll(
                    u2, L0b - offs_b[j], axis=0)
                dw_ref[row0_b + j] += jax.lax.dot_general(
                    shifted_u2, d_c2pre,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                back = d_c2pre if offs_b[j] == 0 else pltpu.roll(
                    d_c2pre, offs_b[j], axis=0)
                contrib = jax.lax.dot_general(
                    back, w_ref[row0_b + j],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d_u2 = contrib if d_u2 is None else d_u2 + contrib
            db_ref[ci_b, :] += jnp.sum(d_c2pre, axis=0)
            d_c1 = d_u2 * _lrelu_grad(c1, slope)
            d_c1pre = d_c1 * keep_for(g_pairs[p], lr_a)
            row0_a = row0s[p]
            d_u1 = None
            for j in range(n_a):
                shifted_u1 = u1 if offs_a[j] == 0 else pltpu.roll(
                    u1, L0b - offs_a[j], axis=0)
                dw_ref[row0_a + j] += jax.lax.dot_general(
                    shifted_u1, d_c1pre,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                back = d_c1pre if offs_a[j] == 0 else pltpu.roll(
                    d_c1pre, offs_a[j], axis=0)
                contrib = jax.lax.dot_general(
                    back, w_ref[row0_a + j],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d_u1 = contrib if d_u1 is None else d_u1 + contrib
            db_ref[ci_a, :] += jnp.sum(d_c1pre, axis=0)
            dF = d_h_res + d_u1 * _lrelu_grad(h_p, slope)

        # guard rows can hold roll garbage; dx support is [0, BWD_TILE + HALO)
        guard = (row < BWD_TILE + HALO).astype(jnp.float32)
        dx_ref[0, 0] = dF * guard

    dx_slab, dW, db = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, L0b, CL), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((total_taps, CL, CL), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CL), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, L0b, CL), jnp.float32),
            jax.ShapeDtypeStruct((total_taps, CL, CL), jnp.float32),
            jax.ShapeDtypeStruct((8, CL), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L0b, CL), xp.dtype),
            pltpu.VMEM((BWD_TILE, CL), dyp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xp, dyp, w_cat, b_cat)
    return dx_slab, dW, db


def _fused_resblock1_bwd(x, gy, ws, bs, spec, S, interpret):
    """Host-side VJP assembly: pad, run the backward kernel, overlap-add
    the dx slabs, and pull dW back through the (linear) tap transforms to
    the original (O, I, k) torch-layout weights."""
    B, T, CL = x.shape
    convs = [(w, b, k, d) for (w, b), (k, d) in zip(zip(ws, bs), spec)]
    built = [_conv_taps(w, b, k, d, S) for (w, b, k, d) in convs]
    conv_meta = tuple(
        (len(offs), tuple(offs), lr) for (offs, _, _, lr) in built)
    SL = sum(m[2] for m in conv_meta)
    SR = sum(m[1][-1] for m in conv_meta) - SL
    HALO = SL + SR
    # guard the env-tunable backward tile exactly like the forward TILE:
    # a non-multiple-of-8 value breaks Mosaic's 8-aligned slice shapes with
    # an obscure compile error, and BWD_TILE ≤ halo makes the per-step DMA
    # read past the padded buffer
    if BWD_TILE % 8 != 0 or BWD_TILE <= HALO:
        raise ValueError(
            f"RVC_TPU_RESBLOCK_TILE_BWD={BWD_TILE} invalid: must be a "
            f"multiple of 8 and > the chain's total halo reach "
            f"({HALO} frames here)")
    L0b = BWD_TILE + 2 * HALO + (-(BWD_TILE + 2 * HALO)) % 8
    slope = float(__import__("ml_dtypes").bfloat16(0.1)) \
        if x.dtype == jnp.bfloat16 else 0.1
    w_cat = jnp.concatenate(
        [t for (_, t, _, _) in built], axis=0).astype(jnp.float32)
    b_cat = jnp.stack([
        jnp.zeros((x.shape[-1],), jnp.float32) if bb is None
        else bb.astype(jnp.float32)
        for (_, _, bb, _) in built] + [jnp.zeros((x.shape[-1],), jnp.float32)] * 2)
    Tp = -(-T // BWD_TILE) * BWD_TILE
    n_tiles = Tp // BWD_TILE
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (SL, (L0b - BWD_TILE) + Tp - T - SL), (0, 0)))
    dyp = jnp.pad(gy.astype(jnp.float32), ((0, 0), (0, Tp - T), (0, 0)))
    meta = (conv_meta, T, SL, SR, slope)
    dx_slab, dW_cat, db_cat = _fused_bwd_call(
        xp, dyp, w_cat, b_cat, meta=meta, interpret=interpret)

    # overlap-add the per-tile dx slabs (adjacent tiles' input windows
    # overlap by L0b - BWD_TILE rows)
    dxp = jnp.zeros((B, Tp + L0b - BWD_TILE, CL), jnp.float32)
    for i in range(n_tiles):
        dxp = jax.lax.dynamic_update_slice(
            dxp, jax.lax.dynamic_slice(
                dxp, (0, i * BWD_TILE, 0), (B, L0b, CL)) + dx_slab[:, i],
            (0, i * BWD_TILE, 0))
    dx = dxp[:, SL : SL + T].astype(x.dtype)

    # dW back through the linear tap transform to (O, I, k) torch layout
    dws, dbs = [], []
    row0 = 0
    for ci, ((w, b, k, d), (offs, taps, bias, lr)) in enumerate(
            zip(convs, built)):
        n = len(offs)
        dW_packed = dW_cat[row0 : row0 + n]
        row0 += n

        def tap_transform(w_, k_=k, d_=d):
            offs_, taps_, _, _ = _conv_taps(w_, None, k_, d_, S)
            return taps_

        _, tvjp = jax.vjp(tap_transform, w)
        dws.append(tvjp(dW_packed.astype(jnp.float32))[0].astype(w.dtype))
        if b is None:
            dbs.append(None)
        else:
            dbc = db_cat[ci]
            if S > 1:
                dbc = dbc.reshape(S, -1).sum(axis=0)
            dbs.append(dbc.astype(b.dtype))
    return dx, tuple(dws), tuple(dbs)


def fused_resblock1_train(
    x: jax.Array,
    convs: Sequence[tuple[jax.Array, jax.Array | None, int, int]],
    S: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fused chain: forward = the inference kernel,
    backward = the recompute-in-VMEM backward kernel (dx + all dW/db in
    one launch per direction). Gradients flow to the (w, b) entries of
    ``convs`` (and through them to weight-norm v/g outside)."""
    ws = tuple(w for (w, _, _, _) in convs)
    bs = tuple(b for (_, b, _, _) in convs)
    spec = tuple((int(k), int(d)) for (_, _, k, d) in convs)
    has_bias = tuple(b is not None for b in bs)
    fn = _train_fn(spec, S, interpret, has_bias)
    # None biases can't cross the custom_vjp boundary; substitute zeros
    CL = x.shape[-1] // S if S > 1 else x.shape[-1]
    bs_filled = tuple(
        b if b is not None else jnp.zeros((CL,), jnp.float32) for b in bs)
    return fn(x, ws, bs_filled)


@functools.lru_cache(maxsize=None)
def _train_fn(spec, S, interpret, has_bias):
    def mk_convs(ws, bs):
        return [
            (w, (b if hb else None), k, d)
            for w, b, hb, (k, d) in zip(ws, bs, has_bias, spec)
        ]

    @jax.custom_vjp
    def f(x, ws, bs):
        return fused_resblock1(x, mk_convs(ws, bs), S=S, interpret=interpret)

    def fwd(x, ws, bs):
        return f(x, ws, bs), (x, ws, bs)

    def bwd(res, gy):
        x, ws, bs = res
        dx, dws, dbs = _fused_resblock1_bwd(
            x, gy, ws, bs, spec, S, interpret)
        dbs_filled = tuple(
            db if db is not None else jnp.zeros_like(b)
            for db, b in zip(dbs, bs))
        return dx, dws, dbs_filled

    f.defvjp(fwd, bwd)
    return f


def fused_resblock1_sharded(
    x: jax.Array,
    convs: Sequence[tuple[jax.Array, jax.Array | None, int, int]],
    mesh,
    S: int = 1,
    axis: str = "dp",
    interpret: bool = False,
) -> jax.Array:
    """fused_resblock1 under a device mesh: the chunk batch (dim 0)
    shards over ``axis``, weights replicate. The chain is independent per
    batch row, so each chip runs the kernel on its local shard with zero
    collectives — without this shard_map wrapper the SPMD partitioner
    would all-gather the batch around the custom call (no GSPMD rule).
    Inference-only (multi-chip training keeps the unfused convs)."""
    from jax.sharding import PartitionSpec as P

    ws = tuple(w for (w, _, _, _) in convs)
    bs = tuple(b for (_, b, _, _) in convs)
    spec = tuple((int(k), int(d)) for (_, _, k, d) in convs)

    def fn(x_, ws_, bs_):
        cv = [(w, b, k, d) for w, b, (k, d) in zip(ws_, bs_, spec)]
        return fused_resblock1(x_, cv, S=S, interpret=interpret)

    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis, None, None), P(), P()),
        out_specs=P(axis, None, None), check_vma=False,
    )(x, ws, bs)


# ---------------------------------------------------------------------------
# Group kernel (inference): ALL resblocks of one decoder stage in ONE launch
# ---------------------------------------------------------------------------
#
# The decoder averages num_kernels (3) parallel ResBlock1 chains per stage
# (reference models.py:300-311: xs += resblock(x); x = xs / num_kernels).
# As separate kernels that is 3 input reads + 3 output writes + XLA
# add/divide passes per stage, plus per-call padding copies and custom-call
# layout boundaries. This kernel DMAs one shared input tile and runs the
# three chains back-to-back in VMEM, averaging in-register — 1 read + 1
# write per stage.
#
# Design differences vs the v1 single-chain kernel above:
# - No rolls: every tap is a STATIC UNALIGNED SLICE of a haloed buffer
#   (measured supported by Mosaic on TPU v5e, including as dot operands;
#   slice SHAPES stay 8-aligned, offsets are arbitrary).
# - Activations carry in the compute dtype (bf16): with no 32-bit-only
#   rotate in the path there is nothing forcing an f32 carry, and the
#   bf16 carry IS the unfused path's rounding — outputs remain
#   bit-identical to the unfused chain (validated in tests).
# - Buffers shrink as the chain consumes halo: conv c reads fixed-shape
#   slices from a height-H_c buffer and emits height-H_{c+1}; garbage
#   never wraps (no circular shift), so no guard-row reasoning.


def _chain_plan(convs, S):
    """Static plan for one chain: (conv_meta, SL, heights) where heights[c]
    is the buffer height entering conv c (heights[6] == TILE) and taps/bias
    arrays are returned for packing."""
    built = [_conv_taps(w, b, k, d, S) for (w, b, k, d) in convs]
    conv_meta = tuple(
        (len(offs), tuple(offs), lr) for (offs, _, _, lr) in built)
    SL = sum(m[2] for m in conv_meta)
    hs = [TILE]
    for (n, offs, lr) in reversed(conv_meta):
        hs.append(hs[-1] + offs[-1] + (-(hs[-1] + offs[-1])) % 8)
    heights = tuple(reversed(hs))
    return built, conv_meta, SL, heights


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _fused_group_call(x, w_cat, b_cat, *, meta, interpret=False):
    """meta: (chain_metas, chain_SLs, chain_heights, chain_row0s, T,
    SL_max, H_in, inv_n) — all static."""
    (chain_metas, chain_SLs, chain_heights, chain_row0s, T, SL_max, H_in,
     n_chains) = meta
    B, Tpad, CL = x.shape
    n_tiles = (Tpad - (H_in - TILE)) // TILE
    dtype = x.dtype
    import ml_dtypes

    slope = float(ml_dtypes.bfloat16(0.1)) if dtype == jnp.bfloat16 else 0.1

    def kernel(x_hbm, w_ref, b_ref, out_ref, xt, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * TILE, H_in), :], xt, sem)
        cp.start()
        cp.wait()
        tile_org = ti * TILE

        def run_chain(ci_chain):
            conv_meta = chain_metas[ci_chain]
            heights = chain_heights[ci_chain]
            row0s = chain_row0s[ci_chain]
            base = SL_max - chain_SLs[ci_chain]

            def conv(buf, ci, org, H_out):
                n, offs, lr = conv_meta[ci]
                acc = None
                for j in range(n):
                    sl = buf[offs[j]:offs[j] + H_out, :] if (
                        offs[j] or buf.shape[0] != H_out) else buf
                    contrib = jnp.dot(sl, w_ref[row0s[ci] + j],
                                      preferred_element_type=jnp.float32)
                    acc = contrib if acc is None else acc + contrib
                acc = acc + b_ref[ci_chain * 6 + ci, :][None, :]
                y = acc.astype(dtype)
                # zero rows outside [0, T): the unfused path's next conv
                # consumes zero-padding there (torch same-pad semantics)
                pos = jax.lax.broadcasted_iota(jnp.int32, (H_out, 1), 0) + (
                    org + lr + tile_org - SL_max)
                keep = ((pos >= 0) & (pos < T)).astype(dtype)
                return y * keep

            h = xt[pl.ds(base, heights[0]), :] if (
                base or H_in != heights[0]) else xt[:]
            org = base
            for p in range(3):
                ci_a, ci_b = 2 * p, 2 * p + 1
                lr_a = conv_meta[ci_a][2]
                lr_b = conv_meta[ci_b][2]
                t1 = conv(_lrelu(h, slope), ci_a, org, heights[ci_a + 1])
                t2 = conv(_lrelu(t1, slope), ci_b, org + lr_a,
                          heights[ci_b + 1])
                s_p = lr_a + lr_b
                h = h[s_p:s_p + heights[ci_b + 1], :] + t2
                org += s_p
            return h[:TILE, :]

        # reference op order: xs = r0; xs += r1; ...; xs / num_kernels —
        # sequential bf16 adds then one divide, matching unfused rounding
        acc = run_chain(0)
        for c in range(1, n_chains):
            acc = acc + run_chain(c)
        out_ref[0] = acc / n_chains

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
            pltpu.VMEM((H_in, CL), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            # same convention as the single-chain kernel: packed tap count
            # (the MFU metrics track this accounting across rounds)
            flops=2 * B * n_tiles * TILE * CL * CL * sum(
                m[0] for cm in chain_metas for m in cm),
            bytes_accessed=(B * Tpad * CL + B * n_tiles * TILE * CL) * 2
            + sum(m[0] for cm in chain_metas for m in cm) * CL * CL * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_cat, b_cat)


def fused_resblock_group(
    x: jax.Array,
    chains: Sequence[Sequence[tuple[jax.Array, jax.Array | None, int, int]]],
    S: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Average of all chains' fused ResBlock1 outputs in ONE kernel.

    x: (B, Tp, CL) packed activations; chains: per resblock, 6 tuples
    (weight (O, I, k), bias, kernel_size, dilation). Returns
    (Σ_c chain_c(x)) / len(chains), numerically equal to the unfused
    sum-then-divide (reference models.py:300-311). Inference-only.
    """
    B, T, CL = x.shape
    plans = [_chain_plan(c, S) for c in chains]
    SL_max = max(p[2] for p in plans)
    H_need = max((SL_max - p[2]) + p[3][0] for p in plans)
    H_in = H_need + (-H_need) % 8
    if TILE % 8 != 0 or TILE <= H_in - TILE + 8:
        pass  # TILE guard is enforced by fused_resblock1; group reuses it
    dtype = x.dtype
    w_rows, b_rows, chain_row0s = [], [], []
    row = 0
    for built, conv_meta, SL, heights in plans:
        row0s = []
        for (offs, taps, bb, lr) in built:
            row0s.append(row)
            w_rows.append(taps)
            row += taps.shape[0]
            b_rows.append(
                jnp.zeros((CL,), jnp.float32) if bb is None
                else bb.astype(jnp.float32))
        chain_row0s.append(tuple(row0s))
    w_cat = jnp.concatenate(w_rows, axis=0).astype(dtype)
    b_cat = jnp.stack(b_rows)
    Tp = -(-T // TILE) * TILE
    xp = jnp.pad(x, ((0, 0), (SL_max, (H_in - TILE) + Tp - T - SL_max),
                     (0, 0)))
    meta = (
        tuple(p[1] for p in plans),
        tuple(p[2] for p in plans),
        tuple(p[3] for p in plans),
        tuple(chain_row0s),
        T, SL_max, H_in, len(chains),
    )
    out = _fused_group_call(xp, w_cat, b_cat, meta=meta, interpret=interpret)
    return out[:, :T]


def fused_resblock_group_sharded(
    x: jax.Array,
    chains,
    mesh,
    S: int = 1,
    axis: str = "dp",
    interpret: bool = False,
) -> jax.Array:
    """fused_resblock_group under a dp mesh (same rationale as
    fused_resblock1_sharded: batch rows shard, weights replicate, zero
    collectives)."""
    from jax.sharding import PartitionSpec as P

    specs = tuple(tuple((int(k), int(d)) for (_, _, k, d) in c)
                  for c in chains)
    ws = tuple(tuple(w for (w, _, _, _) in c) for c in chains)
    bs = tuple(tuple(b for (_, b, _, _) in c) for c in chains)

    def fn(x_, ws_, bs_):
        cv = [
            [(w, b, k, d) for w, b, (k, d) in zip(cw, cb, sp)]
            for cw, cb, sp in zip(ws_, bs_, specs)
        ]
        return fused_resblock_group(x_, cv, S=S, interpret=interpret)

    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis, None, None), P(), P()),
        out_specs=P(axis, None, None), check_vma=False,
    )(x, ws, bs)


def fused_resblock1(
    x: jax.Array,
    convs: Sequence[tuple[jax.Array, jax.Array | None, int, int]],
    S: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Fused ResBlock1 chain over packed activations.

    x: (B, Tp, CL) with CL = S·C (space-to-depth packed when S > 1, plain
    channels when S == 1). convs: 6 tuples (weight (O, I, k) torch layout,
    bias (O,) or None, kernel_size, dilation) in chain order
    [convs1_0, convs2_0, convs1_1, convs2_1, convs1_2, convs2_2].
    Returns (B, Tp, CL), numerically equal to the unfused chain.
    """
    B, T, CL = x.shape
    built = [_conv_taps(w, b, k, d, S) for (w, b, k, d) in convs]
    conv_meta = tuple(
        (len(offs), tuple(offs), lr) for (offs, _, _, lr) in built)
    SL = sum(m[2] for m in conv_meta)  # total left reach of the chain
    SR = sum(m[1][-1] for m in conv_meta) - SL  # total right reach
    # guard the env-tunable tile size: a non-multiple-of-8 TILE breaks the
    # 8-aligned L0 Mosaic assumption, and TILE ≤ SL+SR makes the per-step
    # halo DMA read past the padded buffer
    if TILE % 8 != 0 or TILE <= SL + SR:
        raise ValueError(
            f"RVC_TPU_RESBLOCK_TILE={TILE} invalid: must be a multiple of 8 "
            f"and > the chain's total halo reach ({SL + SR} frames here)")
    # right halo rounded so the kernel buffer TILE+SL+HR is 8-aligned
    # (Mosaic sublane tiling)
    HR = SR + (-(TILE + SL + SR)) % 8
    dtype = x.dtype
    w_cat = jnp.concatenate([t for (_, t, _, _) in built], axis=0).astype(dtype)
    b_cat = jnp.stack([
        jnp.zeros((CL,), jnp.float32) if bb is None else bb.astype(jnp.float32)
        for (_, _, bb, _) in built])
    Tp = -(-T // TILE) * TILE
    xp = jnp.pad(x, ((0, 0), (SL, HR + Tp - T), (0, 0)))
    meta = (conv_meta, T, SL, HR)
    out = _fused_call(xp, w_cat, b_cat, meta=meta, interpret=interpret)
    return out[:, :T]
