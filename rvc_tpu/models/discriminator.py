"""GAN discriminators: multi-period + scale (reference models.py:1024-1146).

DiscriminatorS is a grouped-conv scale discriminator; DiscriminatorP folds
the waveform into (T/period, period) and runs 2-D convs down the time
axis. V1 uses periods [2,3,5,7,11,17], V2 adds [23,37].

TPU notes: all convs are weight-normalized (training parity); the period
fold is a reshape (reflect-pad to a multiple of the period). Activations
channels-last: 1-D (B, T, C); 2-D (B, T/p, p, C).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d, Conv2dTorch as _Conv2dBase, leaky_relu, LRELU_SLOPE


class Conv2dTorch(_Conv2dBase):
    """Discriminator 2-D conv: weight-normalized by default."""

    weight_norm: bool = True


class DiscriminatorS(nn.Module):
    dtype: Any = jnp.float32
    # width multiplier for tiny validation configs (dryruns/tests): scales
    # every internal channel count; 1.0 is the reference topology (and the
    # only value checkpoints exist for). Grouped convs collapse to groups=1
    # when scaled — group counts don't divide the shrunken widths.
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) -> (logits_flat, feature_maps)."""
        fmap = []
        specs = [
            (1, 16, 15, 1, 1, 7),
            (16, 64, 41, 4, 4, 20),
            (64, 256, 41, 4, 16, 20),
            (256, 1024, 41, 4, 64, 20),
            (1024, 1024, 41, 4, 256, 20),
            (1024, 1024, 5, 1, 1, 2),
        ]
        c = (lambda n: n if n == 1 or self.scale == 1.0
             else max(1, int(n * self.scale)))
        for i, (ci, co, k, s, g, p) in enumerate(specs):
            x = Conv1d(c(ci), c(co), k, stride=s,
                       groups=g if self.scale == 1.0 else 1, padding=p,
                       weight_norm=True, dtype=self.dtype, name=f"convs_{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(c(1024), 1, 3, padding=1, weight_norm=True, dtype=self.dtype,
                   name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: Any = jnp.float32
    scale: float = 1.0  # width multiplier (see DiscriminatorS.scale)

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) -> (logits_flat, feature_maps)."""
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // self.period, self.period, C)
        fmap = []
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        pad = (self.kernel_size - 1) // 2
        c = (lambda n: n if n == 1 or self.scale == 1.0
             else max(1, int(n * self.scale)))
        for i, (ci, co) in enumerate(chans):
            x = Conv2dTorch(c(ci), c(co), (self.kernel_size, 1), (self.stride, 1),
                            (pad, 0), dtype=self.dtype, name=f"convs_{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2dTorch(c(1024), c(1024), (self.kernel_size, 1), (1, 1), (pad, 0),
                        dtype=self.dtype, name="convs_4")(x)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2dTorch(c(1024), 1, (3, 1), (1, 1), (1, 0), dtype=self.dtype,
                        name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


PERIODS_V1 = (2, 3, 5, 7, 11, 17)
PERIODS_V2 = (2, 3, 5, 7, 11, 17, 23, 37)


def _wn_weight(leaf: dict) -> jax.Array:
    """Weight-norm reconstruction, matching Conv2dTorch exactly."""
    v, g = leaf["weight_v"], leaf["weight_g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2, 3), keepdims=True))
    return g * v / (norm + 1e-12)


def packed_mpd_apply(disc: "MultiPeriodDiscriminator", params, y, y_hat):
    """Period-packed MultiPeriodDiscriminator forward: numerically equal to
    ``disc.apply(params, y, y_hat)`` with ~2× fewer convolution launches.

    The GAN step is kernel-count bound on TPU (r4 census), and the period
    ensemble is ~300 conv launches per gradient direction. Periods are
    packed in PAIRS sharing one grouped conv per layer: the pair's folded
    grids (L_a, p_a), (L_b, p_b) sit in one (L_max, p_max) buffer with the
    pair's channels side by side (feature_group_count=2 keeps the weights
    separate), so each of the 6 layers is ONE conv for both periods.

    MEASURED r5 (v5e, 48k_v2, batch 4): the packed form is ~25% SLOWER
    than per-period convs standalone (25.1 vs 20.2 ms fwd+bwd) — XLA's
    grouped-conv gradients plus the ~1.25× pair-padding FLOPs outweigh
    the halved launch count, and the full step regresses 13.6 → 11.8
    steps/s. Kept as an opt-in (RVC_TPU_PACK_DISC=1 /
    Trainer(pack_discriminator=True)) with the exactness test as its
    spec; the default stays per-period.

    Exactness: rows beyond a member's true length are re-zeroed after
    every conv (the conv writes `bias` into empty rows; the next layer's
    edge windows must read zeros there, exactly like the unpacked path's
    zero padding). Columns beyond a member's true period never mix into
    true columns (kernel width 1 along the period axis) and are sliced
    away. FLOP overhead from the pair padding is ~1.5× on the period
    discs — free on a launch-bound step (measured r4: batch 4→8 leaves
    the step wall unchanged).

    params: the ordinary MultiPeriodDiscriminator variables (the param
    tree is IDENTICAL to the unpacked module — importers/checkpoints
    unaffected). Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs) like
    ``disc.apply``.
    """
    periods = PERIODS_V2 if disc.version == "v2" else PERIODS_V1
    dtype = disc.dtype
    p_tree = params["params"]
    B = y.shape[0]
    both = jnp.concatenate([y, y_hat], axis=0)  # (2B, T, 1)

    # scale discriminator: its params are a plain submodule subtree
    ds = DiscriminatorS(dtype=dtype, scale=disc.scale)
    logits_s, fmap_s = ds.apply({"params": p_tree["discriminators_0"]}, both)

    all_logits = [logits_s]
    all_fmaps = [fmap_s]

    kernel, stride = 5, 3
    pad = (kernel - 1) // 2
    T = both.shape[1]

    # fold every period once (reflect pad to a multiple, like DiscriminatorP)
    folded = {}
    for p in periods:
        n_pad = (-T) % p
        xp = (jnp.pad(both, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
              if n_pad else both)
        folded[p] = xp.reshape(both.shape[0], (T + n_pad) // p, p, 1)

    buckets = [tuple(periods[i : i + 2]) for i in range(0, len(periods), 2)]
    chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
    c = (lambda n: n if n == 1 or disc.scale == 1.0
         else max(1, int(n * disc.scale)))
    bucket_out: dict[int, tuple] = {}
    for bucket in buckets:
        n_m = len(bucket)
        p_max = max(bucket)
        lens = [folded[p].shape[1] for p in bucket]
        L_buf = max(lens)
        # pack members into one buffer: channel block m holds period m.
        # pad + concat, NOT at[].set() — TPU scatters serialize (measured
        # r5: the scatter form cost ~2.4 steps/s on the train bench)
        mems = []
        for m, p in enumerate(bucket):
            f = folded[p].astype(dtype)  # (2B, L_m, p, 1)
            mems.append(jnp.pad(
                f, ((0, 0), (0, L_buf - lens[m]), (0, p_max - p), (0, 0))))
        x = jnp.concatenate(mems, axis=-1)
        fmaps: list[list] = [[] for _ in bucket]
        trees = [p_tree[f"discriminators_{periods.index(p) + 1}"]
                 for p in bucket]
        for li in range(6):
            name = f"convs_{li}" if li < 5 else "conv_post"
            ci, co = (chans[li] if li < 5 else (1024, 1))
            ci, co = c(ci), c(co)
            s_l = stride if li < 4 else 1
            k_l, pd_l = (kernel, pad) if li < 5 else (3, 1)
            w = jnp.concatenate(
                [_wn_weight(t[name]) for t in trees], axis=0)  # (n_m·co, ci, k, 1)
            b = jnp.concatenate([t[name]["bias"] for t in trees])
            yb = jax.lax.conv_general_dilated(
                x, w.astype(dtype), window_strides=(s_l, 1),
                padding=[(pd_l, pd_l), (0, 0)],
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
                feature_group_count=n_m,
            ) + b.astype(dtype)
            lens = [(L - 1) // s_l + 1 for L in lens]
            L_buf = (L_buf - 1) // s_l + 1
            if li < 5:
                # re-zero rows beyond each member's true length so the next
                # layer's edge windows see the unpacked path's zero padding
                rows = jnp.arange(L_buf)[None, :, None, None]
                cut = jnp.repeat(jnp.asarray(lens), co)[None, None, None, :]
                yb = jnp.where(rows < cut, leaky_relu(yb, LRELU_SLOPE), 0.0)
            x = yb
            for m, p in enumerate(bucket):
                fmaps[m].append(x[:, : lens[m], :p, m * co : (m + 1) * co])
        for m, p in enumerate(bucket):
            logits = fmaps[m][-1].reshape(x.shape[0], -1)
            bucket_out[periods.index(p)] = (logits, fmaps[m])

    for i in range(len(periods)):
        logits, fm = bucket_out[i]
        all_logits.append(logits)
        all_fmaps.append(fm)

    y_d_rs = [lg[:B] for lg in all_logits]
    y_d_gs = [lg[B:] for lg in all_logits]
    fmap_rs = [[m[:B] for m in fm] for fm in all_fmaps]
    fmap_gs = [[m[B:] for m in fm] for fm in all_fmaps]
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiPeriodDiscriminator(nn.Module):
    """Scale + period ensemble. version 'v1'/'v2' picks the period set."""

    version: str = "v2"
    dtype: Any = jnp.float32
    scale: float = 1.0  # width multiplier (see DiscriminatorS.scale)

    @nn.compact
    def __call__(self, y, y_hat):
        periods = PERIODS_V2 if self.version == "v2" else PERIODS_V1
        discs = [DiscriminatorS(dtype=self.dtype, scale=self.scale,
                                name="discriminators_0")] + [
            DiscriminatorP(p, dtype=self.dtype, scale=self.scale,
                           name=f"discriminators_{i + 1}")
            for i, p in enumerate(periods)
        ]
        # real and fake ride ONE batched pass per sub-discriminator (convs
        # and leaky-relus are per-sample, so this is numerically identical
        # to two passes) — the train step is kernel-count-bound on TPU and
        # this halves the ensemble's ~300 conv launches per direction
        B = y.shape[0]
        both = jnp.concatenate([y, y_hat], axis=0)
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            rg, frg = d(both)
            y_d_rs.append(rg[:B])
            y_d_gs.append(rg[B:])
            fmap_rs.append([m[:B] for m in frg])
            fmap_gs.append([m[B:] for m in frg])
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
