"""Pallas TPU kernels: fused gated-WaveNet (VITS "WN") stack, fwd + VJP.

The posterior encoder (16 layers) and the four coupling flows (3 layers
each) are WN stacks of small convs at (B≈4, T≈400, C=192) training shapes
— the GAN step is KERNEL-COUNT bound (see pallas_resblock.py), and the
unfused WN costs ~5 kernels per layer per direction (~480 per step across
enc_q + flows + vjps). This kernel runs a whole stack per launch:

  per layer i:  a = conv_k(x)·Wa_i + ba_i + ga_i     (per-tap MXU matmuls)
                b = conv_k(x)·Wb_i + bb_i + gb_i
                acts = tanh(a) · sigmoid(b)
                x    = (x + acts @ Wres_i + bres_i) · mask
                skip += acts @ Wskip_i + bskip_i
  return skip · mask

matching reference modules.py:132-217 exactly. The tanh/sigmoid halves
live in SEPARATE C-wide buffers end to end (C=192 is not a multiple of
the 128-lane tile, so Mosaic rejects lane-dim slicing of a 2C buffer);
the last layer's C-wide res_skip output is routed entirely to the skip
weights with zero res weights, so the loop body is uniform. Frames stay
aligned (same-padding, dilation 1 — both users); per-layer STATIC
validity bounds zero the rows circular rolls can no longer compute
exactly, so wrap garbage never reaches the owned center.

The backward kernel recomputes the stack per tile in VMEM (storing layer
inputs and both gate pre-activations), then walks it backward: dx slab +
all weight/bias grads and the per-sample conditioning cotangent dG in one
launch. Per-tile cotangent ownership masking makes accumulated dW exact
(see pallas_resblock.py for the argument). The module-level glue
(models/wavenet.WN._fused) extracts weight-norm-folded weights in the
split layout; gradients flow back through the folds by autodiff outside.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_WN = 1024  # cap; the tile shrinks to the (8-aligned) sequence
#                 length when shorter — training runs T≈400, and a 1024
#                 tile would waste 2.7x compute on halo+pad rows


def _tile_for(T: int) -> int:
    return min(TILE_WN, -(-T // 8) * 8)


def _sg(x):
    return jax.nn.sigmoid(x)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _wn_fwd_call(xp, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2, lengths,
                 *, meta, interpret=False):
    """xp (B, Tp + 2H, C) f32; w_a/w_b (L·k, C, C); b_ab (2L, C) rows
    [a_0..a_{L-1}, b_0..b_{L-1}]; g_ab (B, 2L, C) same row plan;
    w_res/w_skip (L, C, C); b_rs2 (2L, C) rows [res..., skip...];
    lengths (B,) i32. Returns skip (B, Tp, C) f32."""
    L, k, C, T = meta
    H = L * ((k - 1) // 2)
    B = xp.shape[0]
    TILE = _tile_for(T)
    L0 = TILE + 2 * H + (-(TILE + 2 * H)) % 8
    n_tiles = (xp.shape[1] - (L0 - TILE)) // TILE
    pad_l = (k - 1) // 2

    def kernel(len_ref, x_hbm, wa_ref, wb_ref, bab_ref, gab_ref, wres_ref,
               wskip_ref, brs_ref, out_ref, xout_ref, xt, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * TILE, L0), :], xt, sem)
        cp.start()
        cp.wait()
        seq_len = len_ref[bi]
        row = jax.lax.broadcasted_iota(jnp.int32, (L0, 1), 0)
        pos = row + (ti * TILE - H)
        keep = ((pos >= 0) & (pos < seq_len)).astype(jnp.float32)

        x = xt[:].astype(jnp.float32)
        skip = jnp.zeros((L0, C), jnp.float32)
        for i in range(L):
            a = None
            b = None
            for j in range(k):
                off = j - pad_l
                shifted = x if off == 0 else pltpu.roll(x, (L0 - off) % L0,
                                                        axis=0)
                ca = jnp.dot(shifted, wa_ref[i * k + j],
                             preferred_element_type=jnp.float32)
                cb = jnp.dot(shifted, wb_ref[i * k + j],
                             preferred_element_type=jnp.float32)
                a = ca if a is None else a + ca
                b = cb if b is None else b + cb
            a = a + bab_ref[i, :][None, :] + gab_ref[0, i, :][None, :]
            b = b + bab_ref[L + i, :][None, :] + gab_ref[0, L + i, :][None, :]
            acts = jnp.tanh(a) * _sg(b)
            res = jnp.dot(acts, wres_ref[i],
                          preferred_element_type=jnp.float32) \
                + brs_ref[i, :][None, :]
            sk = jnp.dot(acts, wskip_ref[i],
                         preferred_element_type=jnp.float32) \
                + brs_ref[L + i, :][None, :]
            # static validity bounds kill circular-roll wrap garbage; the
            # owned center stays inside every bound
            lo, hi = pad_l * (i + 1), L0 - pad_l * (i + 1)
            valid = ((row >= lo) & (row < hi)).astype(jnp.float32)
            x = (x + res) * keep * valid
            skip = skip + sk
        out_ref[0] = (skip * keep)[H : H + TILE, :]
        xout_ref[0] = x[H : H + TILE, :]

    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * L, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles * TILE, C), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles * TILE, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L0, C), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(lengths, xp, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _wn_bwd_call(xp, dyp, dyxp, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2,
                 lengths, *, meta, interpret=False):
    """Backward: (dx_slab (B, n_tiles, L0, C), dWa, dWb, dB_ab (2L, C),
    dG (B, 2L, C), dWres, dWskip, dB_rs (2L, C))."""
    L, k, C, T = meta
    H = L * ((k - 1) // 2)
    B = xp.shape[0]
    TILE = _tile_for(T)
    L0 = TILE + 2 * H + (-(TILE + 2 * H)) % 8
    n_tiles = (xp.shape[1] - (L0 - TILE)) // TILE
    pad_l = (k - 1) // 2

    def kernel(len_ref, x_hbm, dy_hbm, dyx_hbm, wa_ref, wb_ref, bab_ref,
               gab_ref, wres_ref, wskip_ref, brs_ref,
               dx_ref, dwa_ref, dwb_ref, dbab_ref, dg_ref, dwres_ref,
               dwskip_ref, dbrs_ref, xt, dyt, dyxt, sem, sem2, sem3):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * TILE, L0), :], xt, sem)
        cp.start()
        cp2 = pltpu.make_async_copy(
            dy_hbm.at[bi, pl.ds(ti * TILE, TILE), :], dyt, sem2)
        cp2.start()
        cp3 = pltpu.make_async_copy(
            dyx_hbm.at[bi, pl.ds(ti * TILE, TILE), :], dyxt, sem3)
        cp3.start()
        cp.wait()
        cp2.wait()
        cp3.wait()

        @pl.when((bi == 0) & (ti == 0))
        def _():
            dwa_ref[...] = jnp.zeros_like(dwa_ref)
            dwb_ref[...] = jnp.zeros_like(dwb_ref)
            dbab_ref[...] = jnp.zeros_like(dbab_ref)
            dwres_ref[...] = jnp.zeros_like(dwres_ref)
            dwskip_ref[...] = jnp.zeros_like(dwskip_ref)
            dbrs_ref[...] = jnp.zeros_like(dbrs_ref)

        @pl.when(ti == 0)
        def _():
            dg_ref[...] = jnp.zeros_like(dg_ref)

        seq_len = len_ref[bi]
        row = jax.lax.broadcasted_iota(jnp.int32, (L0, 1), 0)
        pos = row + (ti * TILE - H)
        keep = ((pos >= 0) & (pos < seq_len)).astype(jnp.float32)

        # ---- forward recompute (same static masks as the fwd kernel)
        x = xt[:].astype(jnp.float32)
        xs, pre_a, pre_b = [], [], []
        for i in range(L):
            xs.append(x)
            a = None
            b = None
            for j in range(k):
                off = j - pad_l
                shifted = x if off == 0 else pltpu.roll(x, (L0 - off) % L0,
                                                        axis=0)
                ca = jnp.dot(shifted, wa_ref[i * k + j],
                             preferred_element_type=jnp.float32)
                cb = jnp.dot(shifted, wb_ref[i * k + j],
                             preferred_element_type=jnp.float32)
                a = ca if a is None else a + ca
                b = cb if b is None else b + cb
            a = a + bab_ref[i, :][None, :] + gab_ref[0, i, :][None, :]
            b = b + bab_ref[L + i, :][None, :] + gab_ref[0, L + i, :][None, :]
            pre_a.append(a)
            pre_b.append(b)
            acts = jnp.tanh(a) * _sg(b)
            res = jnp.dot(acts, wres_ref[i],
                          preferred_element_type=jnp.float32) \
                + brs_ref[i, :][None, :]
            lo, hi = pad_l * (i + 1), L0 - pad_l * (i + 1)
            valid = ((row >= lo) & (row < hi)).astype(jnp.float32)
            x = (x + res) * keep * valid

        # ---- cotangent: owned output rows of the final skip·mask
        own = ((row >= H) & (row < H + TILE)
               & (pos >= 0) & (pos < seq_len)).astype(jnp.float32)
        d_skip = jnp.pad(dyt[:].astype(jnp.float32),
                         ((H, L0 - TILE - H), (0, 0))) * own
        d_x = jnp.pad(dyxt[:].astype(jnp.float32),
                      ((H, L0 - TILE - H), (0, 0))) * own
        for i in range(L - 1, -1, -1):
            a, b = pre_a[i], pre_b[i]
            th = jnp.tanh(a)
            sg = _sg(b)
            acts = th * sg
            d_res = d_x * keep
            dwres_ref[i] += jax.lax.dot_general(
                acts, d_res, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwskip_ref[i] += jax.lax.dot_general(
                acts, d_skip, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbrs_ref[i, :] += jnp.sum(d_res, axis=0)
            dbrs_ref[L + i, :] += jnp.sum(d_skip, axis=0)
            d_acts = jax.lax.dot_general(
                d_res, wres_ref[i],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) \
                + jax.lax.dot_general(
                    d_skip, wskip_ref[i],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            d_a = d_acts * sg * (1.0 - th * th)
            d_b = d_acts * th * sg * (1.0 - sg)
            dg_ref[0, i, :] += jnp.sum(d_a, axis=0)
            dg_ref[0, L + i, :] += jnp.sum(d_b, axis=0)
            dbab_ref[i, :] += jnp.sum(d_a, axis=0)
            dbab_ref[L + i, :] += jnp.sum(d_b, axis=0)
            x_i = xs[i]
            d_xi = d_res  # residual path
            for j in range(k):
                off = j - pad_l
                shifted_x = x_i if off == 0 else pltpu.roll(
                    x_i, (L0 - off) % L0, axis=0)
                dwa_ref[i * k + j] += jax.lax.dot_general(
                    shifted_x, d_a,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dwb_ref[i * k + j] += jax.lax.dot_general(
                    shifted_x, d_b,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                back_a = d_a if off == 0 else pltpu.roll(d_a, off % L0, axis=0)
                back_b = d_b if off == 0 else pltpu.roll(d_b, off % L0, axis=0)
                d_xi = d_xi + jax.lax.dot_general(
                    back_a, wa_ref[i * k + j],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) \
                    + jax.lax.dot_general(
                        back_b, wb_ref[i * k + j],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
            # static support bound: the true cotangent cone spreads pad_l
            # rows/layer from the owned center; outside = wrap garbage.
            # No keep here — the layer mask's adjoint is folded via d_res;
            # the conv path legitimately reaches beyond-length rows within
            # conv reach, like the unfused module.
            lo_b = max(0, H - pad_l * (L - i))
            hi_b = min(L0, H + TILE + pad_l * (L - i))
            support = ((row >= lo_b) & (row < hi_b)).astype(jnp.float32)
            d_x = d_xi * support
        dx_ref[0, 0] = d_x

    outs = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * L, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, L0, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L * k, C, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L * k, C, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * L, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, C, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, C, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, L0, C), jnp.float32),
            jax.ShapeDtypeStruct((L * k, C, C), jnp.float32),
            jax.ShapeDtypeStruct((L * k, C, C), jnp.float32),
            jax.ShapeDtypeStruct((2 * L, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 2 * L, C), jnp.float32),
            jax.ShapeDtypeStruct((L, C, C), jnp.float32),
            jax.ShapeDtypeStruct((L, C, C), jnp.float32),
            jax.ShapeDtypeStruct((2 * L, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L0, C), xp.dtype),
            pltpu.VMEM((TILE, C), dyp.dtype),
            pltpu.VMEM((TILE, C), dyp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(lengths, xp, dyp, dyxp, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2)
    return outs


def _prep(x, L, k):
    H = L * ((k - 1) // 2)
    B, T, C = x.shape
    TILE = _tile_for(T)
    Tp = -(-T // TILE) * TILE
    L0 = TILE + 2 * H + (-(TILE + 2 * H)) % 8
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (H, (L0 - TILE) - H + Tp - T, ), (0, 0)))
    return xp, Tp, L0, H


def fused_wn(x, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2, lengths, *,
             kernel_size, interpret=False, group_size=8):
    """Differentiable fused WN stack (split tanh/sigmoid weight layout —
    see module docstring). Returns skip·mask (B, T, C) in x.dtype.

    C is padded up to the 128-lane tile OUTSIDE the custom_vjp (Mosaic
    rejects sub-indexing 3-D VMEM refs whose lane dim isn't a tile
    multiple — C=192 for both users); jnp.pad's own vjp slices the grads
    back. Stacks deeper than ``group_size`` chain several kernel launches
    (each group's forward also emits its final x) — the 16-layer
    posterior encoder at Cp=256 otherwise blows the 128 MB VMEM budget in
    the backward (weights + dW accumulators + stored activations)."""
    L = w_res.shape[0]
    C = w_res.shape[1]
    k = int(kernel_size)
    Cp = -(-C // 128) * 128
    if Cp != C:
        pc = Cp - C
        pad2 = lambda w: jnp.pad(w, ((0, 0), (0, pc), (0, pc)))  # noqa: E731
        padl = lambda a: jnp.pad(  # noqa: E731
            a, ((0, 0),) * (a.ndim - 1) + ((0, pc),))
        x = padl(x)
        w_a, w_b = pad2(w_a), pad2(w_b)
        w_res, w_skip = pad2(w_res), pad2(w_skip)
        b_ab, g_ab, b_rs2 = padl(b_ab), padl(g_ab), padl(b_rs2)
    skip_total = None
    for i0 in range(0, L, group_size):
        i1 = min(L, i0 + group_size)
        Lg = i1 - i0
        fn = _wn_train_fn(Lg, k, int(Cp), x.shape[1], bool(interpret))
        skip_g, x = fn(
            x,
            w_a[i0 * k : i1 * k], w_b[i0 * k : i1 * k],
            jnp.concatenate([b_ab[i0:i1], b_ab[L + i0 : L + i1]], axis=0),
            jnp.concatenate([g_ab[:, i0:i1], g_ab[:, L + i0 : L + i1]],
                            axis=1),
            w_res[i0:i1], w_skip[i0:i1],
            jnp.concatenate([b_rs2[i0:i1], b_rs2[L + i0 : L + i1]], axis=0),
            lengths)
        skip_total = skip_g if skip_total is None else skip_total + skip_g
    return skip_total[..., :C] if Cp != C else skip_total


@functools.lru_cache(maxsize=None)
def _wn_train_fn(L, k, C, T, interpret):
    meta = (L, k, C, T)

    def cast(*ts):
        return tuple(t.astype(jnp.float32) for t in ts)

    @jax.custom_vjp
    def f(x, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2, lengths):
        xp, Tp, L0, H = _prep(x, L, k)
        skip, x_out = _wn_fwd_call(
            xp, *cast(w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2), lengths,
            meta=meta, interpret=interpret)
        return skip[:, :T].astype(x.dtype), x_out[:, :T].astype(x.dtype)

    def fwd(x, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2, lengths):
        return f(x, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2, lengths), (
            x, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2, lengths)

    def bwd(res, gys):
        gy_skip, gy_x = gys
        x, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2, lengths = res
        B, T_, C_ = x.shape
        xp, Tp, L0, H = _prep(x, L, k)
        dyp = jnp.pad(gy_skip.astype(jnp.float32),
                      ((0, 0), (0, Tp - T_), (0, 0)))
        dyxp = jnp.pad(gy_x.astype(jnp.float32),
                       ((0, 0), (0, Tp - T_), (0, 0)))
        (dx_slab, dWa, dWb, dBab, dG, dWres, dWskip, dBrs) = _wn_bwd_call(
            xp, dyp, dyxp, *cast(w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2),
            lengths, meta=meta, interpret=interpret)
        TILE = _tile_for(T_)
        n_tiles = Tp // TILE
        dxp = jnp.zeros((B, Tp + L0 - TILE, C_), jnp.float32)
        for i in range(n_tiles):
            dxp = jax.lax.dynamic_update_slice(
                dxp, jax.lax.dynamic_slice(
                    dxp, (0, i * TILE, 0), (B, L0, C_)) + dx_slab[:, i],
                (0, i * TILE, 0))
        dx = dxp[:, H : H + T_].astype(x.dtype)
        return (dx, dWa.astype(w_a.dtype), dWb.astype(w_b.dtype),
                dBab.astype(b_ab.dtype), dG.astype(g_ab.dtype),
                dWres.astype(w_res.dtype), dWskip.astype(w_skip.dtype),
                dBrs.astype(b_rs2.dtype), None)

    f.defvjp(fwd, bwd)
    return f
