"""RMVPE pitch estimator (DeepUnet + BiGRU salience network) in Flax.

Architecture follows reference lib/rmvpe.py: log-mel frontend
(128 HTK mels, 16 kHz, win/n_fft 1024, hop 160, fmin 30, fmax 8000, clamp
1e-5, center=True; :476-556), E2E(4 blocks, 1 GRU, (2,2) pooling)
(:431-470), 5-level res-conv U-net over (time, mel) with BatchNorm
(inference stats), BiGRU over flattened 3×128 maps, 360-bin sigmoid
salience, local-average cents decode (:661-685) → f0 Hz.

TPU-first notes:
  * mel frontend is the shared DFT-matmul stft (ops/stft.py);
  * the GRU input projection is hoisted out of the scan (one big matmul),
    the scan carries only the 256-wide recurrent matmul;
  * frames are padded to a multiple of 32 (U-net depth) with reflect, as
    the reference does (:590-605), keeping shapes static per bucket;
  * the cents decode is vectorized jnp (take_along_axis windows) instead
    of the reference's per-frame python loop.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.mel import _mel_filterbank_np, dynamic_range_compression
from ..ops.stft import stft as _stft
from .layers import BatchNorm, Conv2dTorch, ConvTranspose2dTorch, Linear

N_MELS = 128
N_CLASS = 360
SR = 16000
WIN = 1024
HOP = 160


def mel_frontend(audio: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, T) 16 kHz -> (B, frames, 128) log-mel (HTK scale, clamp 1e-5)."""
    real, imag = _stft(audio, WIN, HOP, WIN, center=True, pad_mode="reflect")
    mag = jnp.sqrt(real * real + imag * imag + 1e-12)
    fb = jnp.asarray(
        _mel_filterbank_np(SR, WIN, N_MELS, 30.0, 8000.0, htk=True), mag.dtype
    )
    mel = jnp.matmul(mag, fb, precision=jax.lax.Precision.HIGHEST)
    return dynamic_range_compression(mel).astype(dtype)


class ConvBlockRes(nn.Module):
    """Two 3×3 convs + BN/relu + residual (reference rmvpe.ConvBlockRes).

    ``s2d`` > 1: the block runs on the frequency-packed layout
    (B, T, F/S, S·C) — the shallow U-net levels' C = 16/32/64 convs fill
    only 1/8-1/2 of the MXU's 128 lanes (measured 1.3% MFU at level 0);
    packing S frequency bins into channels makes every conv a dense
    128-lane block-Toeplitz conv with IDENTICAL parameters and output
    (free reshapes outside; see layers._s2d_weight_2d)."""

    in_channels: int
    out_channels: int
    s2d: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        S = self.s2d
        h = Conv2dTorch(self.in_channels, self.out_channels, (3, 3), padding=(1, 1),
                        use_bias=False, s2d_w=S, dtype=self.dtype, name="conv_0")(x)
        h = BatchNorm(self.out_channels, tile=S, dtype=self.dtype, name="conv_1")(h)
        h = jax.nn.relu(h)
        h = Conv2dTorch(self.out_channels, self.out_channels, (3, 3), padding=(1, 1),
                        use_bias=False, s2d_w=S, dtype=self.dtype, name="conv_3")(h)
        h = BatchNorm(self.out_channels, tile=S, dtype=self.dtype, name="conv_4")(h)
        h = jax.nn.relu(h)
        if self.in_channels != self.out_channels:
            x = Conv2dTorch(self.in_channels, self.out_channels, (1, 1),
                            s2d_w=S, dtype=self.dtype, name="shortcut")(x)
        return h + x


def _avg_pool_2x2(x: jax.Array) -> jax.Array:
    B, T, F, C = x.shape
    return x.reshape(B, T // 2, 2, F // 2, 2, C).mean(axis=(2, 4))


def _pack_f(x: jax.Array, S: int) -> jax.Array:
    """(B, T, F, C) → (B, T, F/S, S·C): free row-major reshape."""
    if S == 1:
        return x
    B, T, F, C = x.shape
    return x.reshape(B, T, F // S, S * C)


def _unpack_f(x: jax.Array, S: int) -> jax.Array:
    if S == 1:
        return x
    B, T, W, SC = x.shape
    return x.reshape(B, T, W * S, SC // S)


def _pack_factor(channels: int, freq: int) -> int:
    """Frequency s2d factor that fills the 128-lane MXU: S·C == 128,
    capped by the available frequency extent."""
    S = max(1, 128 // max(channels, 1))
    while S > 1 and (freq % S or freq // S < 8):
        S //= 2
    return S


class ResEncoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    n_blocks: int
    pool: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # run the conv stack frequency-packed (pool and the caller stay in
        # the plain layout; pack/unpack are free reshapes)
        S = _pack_factor(self.out_channels, x.shape[2])
        x = _pack_f(x, S)
        x = ConvBlockRes(self.in_channels, self.out_channels, s2d=S,
                         dtype=self.dtype, name="conv_0")(x)
        for i in range(1, self.n_blocks):
            x = ConvBlockRes(self.out_channels, self.out_channels, s2d=S,
                             dtype=self.dtype, name=f"conv_{i}")(x)
        x = _unpack_f(x, S)
        if self.pool:
            return x, _avg_pool_2x2(x)
        return x


class ResDecoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    n_blocks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        h = ConvTranspose2dTorch(
            self.in_channels, self.out_channels, (3, 3), stride=(2, 2), padding=(1, 1),
            output_padding=(1, 1), use_bias=False, dtype=self.dtype, name="conv1_0",
        )(x)
        h = BatchNorm(self.out_channels, dtype=self.dtype, name="conv1_1")(h)
        h = jax.nn.relu(h)
        h = jnp.concatenate([h, skip], axis=-1)
        S = _pack_factor(self.out_channels, h.shape[2])
        h = _pack_f(h, S)
        h = ConvBlockRes(self.out_channels * 2, self.out_channels, s2d=S,
                         dtype=self.dtype, name="conv2_0")(h)
        for i in range(1, self.n_blocks):
            h = ConvBlockRes(self.out_channels, self.out_channels, s2d=S,
                             dtype=self.dtype, name=f"conv2_{i}")(h)
        return _unpack_f(h, S)


class DeepUnet(nn.Module):
    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    in_channels: int = 1
    en_out_channels: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, 128, 1)
        x = BatchNorm(self.in_channels, dtype=self.dtype, name="encoder_bn")(x)
        skips = []
        cin, cout = self.in_channels, self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(cin, cout, self.n_blocks, pool=True,
                                      dtype=self.dtype, name=f"encoder_layers_{i}")(x)
            skips.append(skip)
            cin, cout = cout, cout * 2
        # intermediate: cin is the deepest encoder out (=256), widened to 512
        x = ResEncoderBlock(cin, cout, self.n_blocks, pool=False, dtype=self.dtype,
                            name="intermediate_layers_0")(x)
        for i in range(1, self.inter_layers):
            x = ResEncoderBlock(cout, cout, self.n_blocks, pool=False, dtype=self.dtype,
                                name=f"intermediate_layers_{i}")(x)
        cin = cout
        for i in range(self.en_de_layers):
            cout = cin // 2
            x = ResDecoderBlock(cin, cout, self.n_blocks, dtype=self.dtype,
                                name=f"decoder_layers_{i}")(x, skips[-1 - i])
            cin = cout
        return x  # (B, T, 128, en_out_channels)


class BiGRU(nn.Module):
    """Single-layer bidirectional GRU with torch parameterization.

    Input projections for all timesteps are one big (B*T, I)x(I, 3H)
    matmul outside the scan — the scan carries only h @ W_hh.
    """

    input_size: int
    hidden_size: int
    dtype: Any = jnp.float32

    def _params(self, suffix: str):
        H = self.hidden_size
        bound = 1.0 / np.sqrt(H)
        init = lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound)  # noqa: E731
        return (
            self.param(f"weight_ih_l0{suffix}", init, (3 * H, self.input_size)),
            self.param(f"weight_hh_l0{suffix}", init, (3 * H, H)),
            self.param(f"bias_ih_l0{suffix}", init, (3 * H,)),
            self.param(f"bias_hh_l0{suffix}", init, (3 * H,)),
        )

    @nn.compact
    def __call__(self, x):
        """Both directions ride ONE scan: the forward sequence and the
        time-flipped sequence stack on the batch axis, with per-direction
        recurrent weights as a leading-dim batched matmul. Exactly the two
        independent GRUs (torch parameterization), at HALF the sequential
        step count — the scan's per-iteration launch overhead, not math,
        dominates at (B≈1, H=256) sizes (measured 83 ms for a 66 s track,
        ~2× the rest of RMVPE combined)."""
        H = self.hidden_size
        w_ih_f, w_hh_f, b_ih_f, b_hh_f = self._params("")
        w_ih_r, w_hh_r, b_ih_r, b_hh_r = self._params("_reverse")
        B, T, _ = x.shape
        xc = x.astype(self.dtype)
        xg_f = jnp.matmul(xc, w_ih_f.T.astype(self.dtype)) + b_ih_f.astype(self.dtype)
        xg_r = jnp.matmul(xc, w_ih_r.T.astype(self.dtype)) + b_ih_r.astype(self.dtype)
        # (T, 2B, 3H): forward stream then reversed stream
        xg = jnp.concatenate(
            [jnp.swapaxes(xg_f, 0, 1), jnp.swapaxes(jnp.flip(xg_r, axis=1), 0, 1)],
            axis=1)
        # per-stream recurrent weights: (2B, H, 3H)
        w_hh = jnp.concatenate([
            jnp.broadcast_to(w_hh_f.T.astype(self.dtype)[None], (B, H, 3 * H)),
            jnp.broadcast_to(w_hh_r.T.astype(self.dtype)[None], (B, H, 3 * H)),
        ], axis=0)
        b_hh = jnp.concatenate([
            jnp.broadcast_to(b_hh_f.astype(self.dtype)[None], (B, 3 * H)),
            jnp.broadcast_to(b_hh_r.astype(self.dtype)[None], (B, 3 * H)),
        ], axis=0)

        def step(h, xg_t):
            hg = jnp.einsum("bh,bhg->bg", h, w_hh) + b_hh
            xr, xz, xn = jnp.split(xg_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hg, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        h0 = jnp.zeros((2 * B, H), self.dtype)
        # unroll: the per-step math is a (2B, 256) matvec — launch overhead
        # dominates; unrolling fuses 8 steps per scan iteration
        _, ys = jax.lax.scan(step, h0, xg, unroll=8)  # (T, 2B, H)
        ys = jnp.swapaxes(ys, 0, 1)  # (2B, T, H)
        fwd = ys[:B]
        bwd = jnp.flip(ys[B:], axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1)


class E2E(nn.Module):
    """Salience network (reference rmvpe.E2E, n_blocks=4, n_gru=1, (2,2))."""

    n_blocks: int = 4
    en_out_channels: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        # mel: (B, T, 128) — reference feeds (B, 1, mel, T) and transposes;
        # our layout is already (time, freq).
        x = mel[..., None]  # (B, T, 128, 1)
        x = DeepUnet(n_blocks=self.n_blocks, en_out_channels=self.en_out_channels,
                     dtype=self.dtype, name="unet")(x)
        x = Conv2dTorch(self.en_out_channels, 3, (3, 3), padding=(1, 1),
                        dtype=self.dtype, name="cnn")(x)  # (B, T, 128, 3)
        B, T, F, C = x.shape
        # reference: transpose(1,2).flatten(-2) on (B, 3, T, 128) -> (B, T, 3*128)
        x = x.transpose(0, 1, 3, 2).reshape(B, T, C * F)
        x = BiGRU(3 * N_MELS, 256, dtype=self.dtype, name="fc_0_gru")(x)
        x = Linear(512, N_CLASS, dtype=self.dtype, name="fc_1")(x)
        return jax.nn.sigmoid(x)


_CENTS_MAPPING = np.pad(20 * np.arange(N_CLASS) + 1997.3794084376191, (4, 4))


def decode_cents(salience: jax.Array, thred: float = 0.03) -> jax.Array:
    """Salience (B, T, 360) -> f0 Hz (B, T) via 9-bin local average around
    the argmax (reference to_local_average_cents, vectorized)."""
    center = jnp.argmax(salience, axis=-1) + 4  # (B, T)
    sal_pad = jnp.pad(salience, ((0, 0), (0, 0), (4, 4)))
    idx = center[..., None] + jnp.arange(-4, 5)[None, None, :]  # (B, T, 9)
    win = jnp.take_along_axis(sal_pad, idx, axis=-1)
    cmap = jnp.asarray(_CENTS_MAPPING, salience.dtype)
    cwin = cmap[idx]
    cents = jnp.sum(win * cwin, -1) / jnp.maximum(jnp.sum(win, -1), 1e-9)
    maxx = jnp.max(salience, axis=-1)
    cents = jnp.where(maxx > thred, cents, 0.0)
    f0 = 10.0 * jnp.power(2.0, cents / 1200.0)
    return jnp.where(f0 == 10.0, 0.0, f0)


class RMVPE(nn.Module):
    """End-to-end f0 from 16 kHz audio; pads frames to a multiple of 32."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: jax.Array, thred: float = 0.03) -> jax.Array:
        mel = mel_frontend(audio, dtype=self.dtype)  # (B, T, 128)
        n_frames = mel.shape[1]
        padding = min(32 * ((n_frames - 1) // 32 + 1) - n_frames, n_frames)
        melp = jnp.pad(mel, ((0, 0), (0, padding), (0, 0)), mode="reflect")
        hidden = E2E(dtype=self.dtype, name="model")(melp)[:, :n_frames]
        return decode_cents(hidden.astype(jnp.float32), thred)
