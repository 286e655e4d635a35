"""Gated dilated-conv WaveNet block (the VITS "WN").

Matches reference lib/infer_pack/modules.py:132-217: per-layer dilated
in_conv → fused add-tanh-sigmoid gate with a global conditioning slice →
1x1 res/skip conv; all convs weight-normalized. Used by the posterior
encoder and the coupling flows.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d


def gated_activation(x: jnp.ndarray, g: jnp.ndarray, channels: int) -> jnp.ndarray:
    """tanh(a) * sigmoid(b) over the channel split (commons.fused_add_tanh_sigmoid_multiply)."""
    s = x + g
    return jnp.tanh(s[..., :channels]) * nn.sigmoid(s[..., channels:])


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    # fused Pallas stack (fwd + custom-VJP bwd, ops/pallas_wavenet): the
    # whole L-layer chain in one kernel per direction. Requires
    # dilation_rate == 1 (both users), no dropout, and an input already
    # masked beyond each sample's length (both callers mask). Param tree
    # identical either way.
    fuse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        # x: (B, T, H); g: (B, 1, gin) or (B, T, gin) or None
        if (self.fuse and self.dilation_rate == 1
                and (self.p_dropout == 0 or deterministic)
                and (g is None or g.shape[1] == 1)):
            return self._fused(x, x_mask, g)
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = Conv1d(
                self.gin_channels,
                2 * self.hidden_channels * self.n_layers,
                1,
                weight_norm=True,
                dtype=self.dtype,
                name="cond_layer",
            )(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(
                self.hidden_channels,
                2 * self.hidden_channels,
                self.kernel_size,
                dilation=dilation,
                padding=padding,
                weight_norm=True,
                dtype=self.dtype,
                name=f"in_layers_{i}",
            )(x)
            if g is not None:
                off = i * 2 * self.hidden_channels
                g_l = g_all[..., off : off + 2 * self.hidden_channels]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = gated_activation(x_in, g_l, self.hidden_channels)
            if self.p_dropout > 0 and not deterministic:
                acts = nn.Dropout(self.p_dropout, deterministic=False)(acts)
            res_skip_ch = (
                2 * self.hidden_channels if i < self.n_layers - 1 else self.hidden_channels
            )
            res_skip = Conv1d(
                self.hidden_channels,
                res_skip_ch,
                1,
                weight_norm=True,
                dtype=self.dtype,
                name=f"res_skip_layers_{i}",
            )(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., : self.hidden_channels]) * x_mask
                output = output + res_skip[..., self.hidden_channels :]
            else:
                output = output + res_skip
        return output * x_mask

    def _fused(self, x, x_mask, g):
        """Weight extraction + one fused_wn launch. Params are created in
        the same order and names as the unfused loop (cond_layer first,
        then in_layers_i / res_skip_layers_i pairs) so the tree is
        identical."""
        import jax as _jax

        from ..ops.pallas_wavenet import fused_wn

        C, k, L = self.hidden_channels, self.kernel_size, self.n_layers
        B = x.shape[0]
        # split tanh/sigmoid halves — Mosaic can't lane-slice a 2C buffer
        # at C=192 (not a multiple of the 128-lane tile)
        if g is not None:
            g_all = Conv1d(
                self.gin_channels, 2 * C * L, 1, weight_norm=True,
                dtype=self.dtype, name="cond_layer",
            )(g)  # (B, 1, 2CL)
            g_lc = g_all[:, 0].reshape(B, L, 2 * C).astype(jnp.float32)
            # rows [a_0..a_{L-1}, b_0..b_{L-1}]
            g_ab = jnp.concatenate([g_lc[:, :, :C], g_lc[:, :, C:]], axis=1)
        else:
            g_ab = jnp.zeros((B, 2 * L, C), jnp.float32)
        was, wbs, bas, bbs, rres, rskip, bres, bskip = ([] for _ in range(8))
        pad = (k - 1) // 2
        for i in range(L):
            w, b = Conv1d(
                C, 2 * C, k, dilation=1, padding=pad, weight_norm=True,
                dtype=self.dtype, name=f"in_layers_{i}",
            )(None, return_weights=True)
            taps = jnp.transpose(w, (2, 1, 0))  # (k, C, 2C)
            was.append(taps[:, :, :C])
            wbs.append(taps[:, :, C:])
            bas.append(b[:C])
            bbs.append(b[C:])
            res_skip_ch = 2 * C if i < L - 1 else C
            rw, rb = Conv1d(
                C, res_skip_ch, 1, weight_norm=True, dtype=self.dtype,
                name=f"res_skip_layers_{i}",
            )(None, return_weights=True)
            rw2 = rw[:, :, 0].T  # (C, out)
            if i == L - 1:
                # last layer's C-wide output is pure skip
                rres.append(jnp.zeros((C, C), rw2.dtype))
                rskip.append(rw2)
                bres.append(jnp.zeros((C,), rb.dtype))
                bskip.append(rb)
            else:
                rres.append(rw2[:, :C])
                rskip.append(rw2[:, C:])
                bres.append(rb[:C])
                bskip.append(rb[C:])
        w_a = jnp.concatenate(was, axis=0)  # (L·k, C, C)
        w_b = jnp.concatenate(wbs, axis=0)
        b_ab = jnp.stack(bas + bbs)  # (2L, C)
        w_res = jnp.stack(rres)
        w_skip = jnp.stack(rskip)
        b_rs2 = jnp.stack(bres + bskip)  # (2L, C)
        lengths = jnp.sum(x_mask[..., 0] > 0, axis=1).astype(jnp.int32)
        out = fused_wn(
            x, w_a, w_b, b_ab, g_ab, w_res, w_skip, b_rs2, lengths,
            kernel_size=k,
            interpret=_jax.default_backend() not in ("tpu", "axon"))
        return out.astype(x.dtype)
