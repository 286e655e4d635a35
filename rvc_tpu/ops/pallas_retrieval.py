"""Pallas TPU kernel: streaming top-1 feature retrieval.

The retrieval hot op (reference faiss search at vc_infer_pipeline.py:65)
is, on TPU, a (T, D)x(D, N) distance matmul + argmin. The jnp version
(retrieval/index.py) materializes the full (T, N) distance matrix in HBM;
for production banks (N up to ~1e6 rows after k-means compaction) that is
a T×N fp32 buffer per dispatch. This kernel streams the bank through VMEM
tile by tile, carrying only the per-query best distance and best INDEX —
O(T) memory independent of N. The winning rows are then fetched with one
XLA gather outside the kernel (T rows — microseconds; the round-2 design
copied rows in-kernel through one-hot matmuls, which forced either
HIGHEST-precision dots or an in-kernel bank transpose, both of which blow
the 128 MB VMEM budget at production tile sizes).

Layout: the bank is consumed TRANSPOSED, (D, N), so the distance dot is a
plain (TQ, D) @ (D, TN) MXU matmul with no in-kernel transpose; |b|² is
precomputed per dispatch (one elementwise pass over the bank). Grid:
(T/TQ, N/TN); the bank axis iterates fastest so the running best lives in
VMEM scratch across bank tiles.

Precision: Mosaic supports only DEFAULT dot precision in-kernel at these
sizes, which rounds f32 operands to bf16. int8 bank values are bf16-EXACT
(|v| ≤ 127), so only the query needs error compensation: q is split
hi + lo with hi bf16-exact and two passes accumulate an ~f32-accurate
dot. The fp32-bank variant splits both operands (three passes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128   # query rows per tile
TN = 2048  # bank columns (rows of the original bank) per tile — big tiles
#            amortize grid-step overhead: at TN=256 a 131k-row bank cost
#            ~512 j-steps per query tile (~15 us each — step overhead, not
#            math, dominated and measured ~100 ms per conversion).

def _mm(a, b):
    """(M, K) @ (K, N), f32 accumulation, DEFAULT precision."""
    return jax.lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _split_bf16(x):
    """Error-compensated split: x == hi + lo with hi bf16-exact."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _argmin_kernel(q_ref, bt_ref, bsq_ref, out_ref, best_d_ref, best_i_ref,
                   *, int8_bank: bool):
    """One (query-tile, bank-tile) step: distances + running argmin.

    q_ref (TQ, D) f32; bt_ref (D, TN) int8|f32 (transposed bank, int8
    values pre-multiplied by nothing — scales are folded into bsq/dots via
    the wrapper); bsq_ref (8, TN) f32 rows: [0] = |b|², [1] = dequant
    scale (int8) or 1, rest padding. out (TQ, 128) int32 best index.
    """
    j = pl.program_id(1)

    q = q_ref[:]
    bt = bt_ref[:].astype(jnp.float32)
    q_hi, q_lo = _split_bf16(q)
    if int8_bank:
        # int8 values are bf16-exact: two compensated passes over q only
        dots = _mm(q_hi, bt) + _mm(q_lo, bt)
    else:
        bt_hi, bt_lo = _split_bf16(bt)
        dots = _mm(q_hi, bt_hi) + _mm(q_hi, bt_lo) + _mm(q_lo, bt_hi)
    scale = bsq_ref[1, :][None, :]  # (1, TN)
    b_sq = bsq_ref[0, :][None, :]
    d2 = b_sq - 2.0 * (dots * scale)  # (TQ, TN)

    tile_min = jnp.min(d2, axis=-1, keepdims=True)  # (TQ, 1)
    # first-minimum index (ties pick the lowest index, like np.argmin)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    local = jnp.min(jnp.where(d2 <= tile_min, col, 2**30), axis=-1,
                    keepdims=True)  # (TQ, 1)
    tile_idx = local + j * d2.shape[1]

    @pl.when(j == 0)
    def _():
        best_d_ref[:] = tile_min
        best_i_ref[:] = tile_idx

    @pl.when(j > 0)
    def _():
        better = tile_min < best_d_ref[:]
        best_d_ref[:] = jnp.where(better, tile_min, best_d_ref[:])
        best_i_ref[:] = jnp.where(better, tile_idx, best_i_ref[:])

    out_ref[:] = jnp.broadcast_to(best_i_ref[:], out_ref.shape)


def _nearest_idx(q, bt, bsq, *, int8_bank: bool, interpret: bool):
    """q (Tp, Dp) f32; bt (Dp, Np); bsq (8, Np) f32 → (Tp,) int32."""
    Tp, Dp = q.shape
    Np = bt.shape[1]
    out = pl.pallas_call(
        functools.partial(_argmin_kernel, int8_bank=int8_bank),
        grid=(Tp // TQ, Np // TN),
        in_specs=[
            pl.BlockSpec((TQ, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TQ, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(q, bt, bsq)
    return out[:, 0]


def _pad_queries(feats):
    T, D = feats.shape
    Tp = (T + TQ - 1) // TQ * TQ
    Dp = (D + 127) // 128 * 128
    return jnp.zeros((Tp, Dp), jnp.float32).at[:T, :D].set(
        feats.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_rows(feats: jax.Array, bank: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """For each feature row, the nearest bank row (squared-L2).

    feats: (T, D); bank: (N, D). T, N, D are padded internally to tile
    multiples; pad bank rows get +inf |b|² so they never win.
    """
    T, D = feats.shape
    N = bank.shape[0]
    Np = (N + TN - 1) // TN * TN
    Dp = (D + 127) // 128 * 128
    q = _pad_queries(feats)
    bank = bank.astype(jnp.float32)
    bt = jnp.zeros((Dp, Np), jnp.float32).at[:D, :N].set(bank.T)
    bsq = jnp.zeros((8, Np), jnp.float32)
    bsq = bsq.at[0].set(jnp.full((Np,), 1e30).at[:N].set(
        jnp.sum(bank * bank, axis=-1)))
    bsq = bsq.at[1].set(1.0)
    idx = _nearest_idx(q, bt, bsq, int8_bank=False, interpret=interpret)[:T]
    return jnp.take(bank, jnp.minimum(idx, N - 1), axis=0)


def blend_into(feats: jax.Array, bank: jax.Array, index_rate: float,
               interpret: bool = False) -> jax.Array:
    """rate·nearest + (1-rate)·feats over a (B, T, D) batch — the k=1 path
    of reference vc_infer_pipeline.py:60-75 as a streaming kernel."""
    B, T, D = feats.shape
    flat = feats.reshape(B * T, D)
    nearest = nearest_rows(flat, bank, interpret=interpret).reshape(B, T, D)
    return (index_rate * nearest + (1.0 - index_rate) * feats.astype(jnp.float32)
            ).astype(feats.dtype)


# -- int8 bank variant --------------------------------------------------------
#
# The streaming search is HBM-bandwidth-bound: every dispatch re-reads the
# whole bank (production banks: up to ~1e6 rows × 768 cols after k-means
# compaction — 3 GB in fp32). Storing the bank as per-row symmetric int8
# (value = round(127·x/max|row|)) cuts that stream 4×; the distance math
# stays ~f32 (exact integer dots × per-row scales), so the only numerics
# change is the bank's own ~0.4% quantization noise — tolerable for
# retrieval blending (the reference's faiss IVF/nprobe=1 is a far coarser
# approximation: vc_infer_pipeline.py:65).


def quantize_bank(bank) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: (N, D) f32 → ((N, D) i8, (N, 1) f32
    dequant scales). Host (numpy) inputs quantize on host first — the int8
    result is what crosses the host→device link (4× fewer bytes; production
    banks reach hundreds of MB)."""
    import numpy as np

    if isinstance(bank, np.ndarray):
        amax = np.max(np.abs(bank), axis=-1, keepdims=True)
        scale = np.maximum(amax, 1e-12) / 127.0
        q = np.clip(np.round(bank / scale), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(scale.astype(np.float32))
    bank = jnp.asarray(bank, jnp.float32)
    amax = jnp.max(jnp.abs(bank), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(bank / scale), -127, 127).astype(jnp.int8)
    return q, scale


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_rows_q(feats: jax.Array, bank_q: jax.Array, scales: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """int8-bank nearest row: feats (T, D) f32, bank_q (N, D) i8,
    scales (N, 1) f32. Returns the DEQUANTIZED nearest rows (T, D) f32.

    d² = |b|² − 2·(q·int)·scale with Σ int² ≤ 768·127² < 2²⁴ (exact f32);
    the scale factors out of the integer dot.
    """
    T, D = feats.shape
    N = bank_q.shape[0]
    Np = (N + TN - 1) // TN * TN
    Dp = (D + 127) // 128 * 128
    q = _pad_queries(feats)
    bt = jnp.zeros((Dp, Np), jnp.int8).at[:D, :N].set(bank_q.T)
    s = scales.astype(jnp.float32)[:, 0]
    # Σ int² fused into the reduce (never materializes the bank in f32);
    # ≤ 768·127² < 2²⁴ so the f32 sum is exact
    b_sq = jnp.sum(jnp.square(bank_q.astype(jnp.float32)), axis=-1) * s * s
    bsq = jnp.zeros((8, Np), jnp.float32)
    bsq = bsq.at[0].set(jnp.full((Np,), 1e30).at[:N].set(b_sq))
    bsq = bsq.at[1].set(jnp.ones((Np,)).at[:N].set(s))
    idx = _nearest_idx(q, bt, bsq, int8_bank=True, interpret=interpret)[:T]
    idx = jnp.minimum(idx, N - 1)
    # gather the winning int8 rows (T rows), dequantize only those
    rows = jnp.take(bank_q, idx, axis=0).astype(jnp.float32)
    return rows * jnp.take(s, idx)[:, None]


def blend_into_q(feats: jax.Array, bank_q: jax.Array, scales: jax.Array,
                 index_rate: float, interpret: bool = False) -> jax.Array:
    """int8-bank version of blend_into: 4× less HBM traffic per dispatch."""
    B, T, D = feats.shape
    flat = feats.reshape(B * T, D)
    nearest = nearest_rows_q(flat, bank_q, scales, interpret=interpret).reshape(B, T, D)
    return (index_rate * nearest + (1.0 - index_rate) * feats.astype(jnp.float32)
            ).astype(feats.dtype)


def blend_into_q_sharded(feats: jax.Array, bank_q: jax.Array,
                         scales: jax.Array, index_rate, mesh,
                         axis: str = "dp",
                         interpret: bool = False) -> jax.Array:
    """blend_into_q under a device mesh: the chunk batch (dim 0 of feats)
    shards over ``axis``; the bank replicates. Retrieval is embarrassingly
    parallel over queries — each chip streams the full bank against its
    local chunks, zero collectives — but the Pallas custom call has no
    GSPMD partitioning rule, so without this shard_map wrapper the SPMD
    partitioner would all-gather the batch and run the kernel replicated.
    (Reference faiss search is a host-side serial loop,
    vc_infer_pipeline.py:60-75; there is no multi-GPU retrieval to match.)
    """
    from jax.sharding import PartitionSpec as P

    fn = functools.partial(blend_into_q, interpret=interpret)
    spec = P(axis, None, None)
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so the (new-default) vma checker rejects it
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec, P(), P(), P()),
        out_specs=spec, check_vma=False,
    )(feats, bank_q, scales, index_rate)
