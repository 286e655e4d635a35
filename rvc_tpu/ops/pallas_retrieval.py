"""Pallas TPU kernel: streaming top-1 feature retrieval.

The retrieval hot op (reference faiss search at vc_infer_pipeline.py:65)
is, on TPU, a (T, D)x(D, N) distance matmul + argmin. The jnp version
(retrieval/index.py) materializes the full (T, N) distance matrix in HBM;
for production banks (N up to ~1e6 rows after k-means compaction) that is
a T×N fp32 buffer per dispatch. This kernel streams the bank through VMEM
tile by tile, carrying only the per-query best distance and best row —
O(T·D) memory independent of N, MXU for both the distance dots and the
one-hot row selection (no gathers).

Grid: (T/TQ, N/TN); the bank axis iterates fastest so the running best
lives in VMEM scratch across bank tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128   # query rows per tile
TN = 2048  # bank rows per tile — big tiles amortize grid-step overhead:
#            at TN=256 a 131k-row bank costs ~512 j-steps per query tile
#            (~15 us each — the step overhead, not the math, dominated and
#            measured ~100 ms per conversion); TN=2048 cuts it 8x. The
#            int8 tile is 1.5 MB (x2 double-buffered) in VMEM.


def _kernel(q_ref, bank_ref, out_ref, best_d_ref, best_row_ref):
    j = pl.program_id(1)

    q = q_ref[:]  # (TQ, D)
    bank = bank_ref[:]  # (TN, D)
    # squared distance up to the per-query constant |q|²:
    # d2' = -2 q·b + |b|²  (argmin-equivalent)
    dots = jax.lax.dot_general(
        q, bank, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # argmin is bf16-sensitive
    )  # (TQ, TN) — contraction on D, no transpose materialized
    b_sq = jnp.sum(bank * bank, axis=-1)[None, :]  # (1, TN)
    d2 = b_sq - 2.0 * dots  # (TQ, TN)

    tile_min = jnp.min(d2, axis=-1, keepdims=True)  # (TQ, 1)
    # equality one-hot (ties average — deterministic, gather-free)
    hits = (d2 <= tile_min).astype(jnp.float32)  # (TQ, TN)
    onehot = hits / jnp.sum(hits, axis=-1, keepdims=True)
    cand = jnp.dot(onehot, bank, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # exact row copy (MXU)

    @pl.when(j == 0)
    def _():
        best_d_ref[:] = tile_min
        best_row_ref[:] = cand

    @pl.when(j > 0)
    def _():
        better = tile_min < best_d_ref[:]
        best_d_ref[:] = jnp.where(better, tile_min, best_d_ref[:])
        best_row_ref[:] = jnp.where(better, cand, best_row_ref[:])

    out_ref[:] = best_row_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_rows(feats: jax.Array, bank: jax.Array, interpret: bool = False) -> jax.Array:
    """For each feature row, the nearest bank row (squared-L2).

    feats: (T, D); bank: (N, D). T, N, D are padded internally to tile
    multiples; pad bank rows are +inf-distance (zeros with huge offset).
    """
    T, D = feats.shape
    N = bank.shape[0]
    Tp = (T + TQ - 1) // TQ * TQ
    Np = (N + TN - 1) // TN * TN
    Dp = (D + 127) // 128 * 128
    q = jnp.zeros((Tp, Dp), jnp.float32).at[:T, :D].set(feats.astype(jnp.float32))
    # zero-pad feature columns (zeros are distance-neutral); poison only the
    # pad ROWS with one large value so their |b|² dominates and they never win
    b = jnp.zeros((Np, Dp), jnp.float32).at[:N, :D].set(bank.astype(jnp.float32))
    if Np > N:
        b = b.at[N:, Dp - 1].set(1e4)

    out = pl.pallas_call(
        _kernel,
        grid=(Tp // TQ, Np // TN),
        in_specs=[
            pl.BlockSpec((TQ, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TQ, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, Dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, b)
    return out[:T, :D]


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
# (value = round(127·x/max|row|)) cuts that stream 4×; the tile is
# dequantized in VMEM (one VPU multiply) and the distance math stays fp32,
# so the only numerics change is the bank's own ~0.4% quantization noise —
# tolerable for retrieval blending (the reference's faiss IVF/nprobe=1 is a
# far coarser approximation: vc_infer_pipeline.py:65).


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


def _kernel_q(q_ref, bank_ref, scale_ref, out_ref, best_d_ref, best_row_ref):
    j = pl.program_id(1)

    q = q_ref[:]  # (TQ, D) f32
    bank = bank_ref[:].astype(jnp.float32) * scale_ref[:]  # dequant in VMEM
    dots = jax.lax.dot_general(
        q, bank, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TQ, TN)
    b_sq = jnp.sum(bank * bank, axis=-1)[None, :]
    d2 = b_sq - 2.0 * dots

    tile_min = jnp.min(d2, axis=-1, keepdims=True)
    hits = (d2 <= tile_min).astype(jnp.float32)
    onehot = hits / jnp.sum(hits, axis=-1, keepdims=True)
    cand = jnp.dot(onehot, bank, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == 0)
    def _():
        best_d_ref[:] = tile_min
        best_row_ref[:] = cand

    @pl.when(j > 0)
    def _():
        better = tile_min < best_d_ref[:]
        best_d_ref[:] = jnp.where(better, tile_min, best_d_ref[:])
        best_row_ref[:] = jnp.where(better, cand, best_row_ref[:])

    out_ref[:] = best_row_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_rows_q(feats: jax.Array, bank_q: jax.Array, scales: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """int8-bank nearest row: feats (T, D) f32, bank_q (N, D) i8,
    scales (N, 1) f32. Returns the DEQUANTIZED nearest rows (T, D) f32."""
    T, D = feats.shape
    N = bank_q.shape[0]
    Tp = (T + TQ - 1) // TQ * TQ
    Np = (N + TN - 1) // TN * TN
    Dp = (D + 127) // 128 * 128
    q = jnp.zeros((Tp, Dp), jnp.float32).at[:T, :D].set(feats.astype(jnp.float32))
    b = jnp.zeros((Np, Dp), jnp.int8).at[:N, :D].set(bank_q)
    s = jnp.zeros((Np, 1), jnp.float32).at[:N].set(scales.astype(jnp.float32))
    if Np > N:
        # poison pad rows: one saturated lane × a huge scale → |b|² dominates
        b = b.at[N:, Dp - 1].set(127)
        s = s.at[N:].set(1e3)

    out = pl.pallas_call(
        _kernel_q,
        grid=(Tp // TQ, Np // TN),
        in_specs=[
            pl.BlockSpec((TQ, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TQ, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, Dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, b, s)
    return out[:T, :D]


def blend_into_q(feats: jax.Array, bank_q: jax.Array, scales: jax.Array,
                 index_rate: float, interpret: bool = False) -> jax.Array:
    """int8-bank version of blend_into: 4× less HBM traffic per dispatch."""
    B, T, D = feats.shape
    flat = feats.reshape(B * T, D)
    nearest = nearest_rows_q(flat, bank_q, scales, interpret=interpret).reshape(B, T, D)
    return (index_rate * nearest + (1.0 - index_rate) * feats.astype(jnp.float32)
            ).astype(feats.dtype)
