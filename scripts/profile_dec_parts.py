"""Decompose the NSF decoder's device time beyond the resblocks: sine
source, upsample convs, noise convs, inter-stage glue, final conv.
Same in-jit iteration-differencing methodology as profile_decoder_stages.

Usage: python scripts/profile_dec_parts.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_tpu.config import preset
    from rvc_tpu.models.nsf import GeneratorNSF, SourceModuleHnNSF
    from rvc_tpu.utils.fastinit import fast_init

    def timed(apply_fn, params, *xs, n1=3, n2=9):
        @functools.partial(jax.jit, static_argnums=(2,))
        def looped(p, xx, iters):
            def body(i, acc):
                scaled = tuple(
                    a * (1.0 + 1e-6 * i.astype(a.dtype))
                    if jnp.issubdtype(a.dtype, jnp.floating) else a
                    for a in xx)
                y = apply_fn(p, *scaled)
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        def wall(iters):
            float(looped(params, xs, iters))
            t0 = time.perf_counter()
            float(looped(params, xs, iters))
            return time.perf_counter() - t0

        t1, t2 = wall(n1), wall(n2)
        return (t2 - t1) / (n2 - n1)

    pc = preset("48k_v2")
    m = pc.model
    B, SEC = 4, 18.0
    Tf = int(SEC * 100)
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    gen = GeneratorNSF(
        initial_channel=m.inter_channels, resblock=m.resblock,
        resblock_kernel_sizes=m.resblock_kernel_sizes,
        resblock_dilation_sizes=m.resblock_dilation_sizes,
        upsample_rates=m.upsample_rates,
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=m.upsample_kernel_sizes,
        gin_channels=m.gin_channels, sr=pc.data.sampling_rate,
        fuse_resblocks=True, fuse_group=True, dtype=dtype)

    x = jnp.asarray(rng.standard_normal((B, Tf, m.inter_channels)) * 0.3,
                    jnp.float32).astype(dtype)
    f0 = jnp.asarray(rng.uniform(100, 300, (B, Tf)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 1, m.gin_channels)) * 0.1,
                    jnp.float32).astype(dtype)
    key = jax.random.PRNGKey(0)

    params = fast_init(functools.partial(
        gen.init, {"params": jax.random.PRNGKey(1)}, x, f0, g,
        rng_key=key))

    t_full = timed(lambda p, xx, ff: gen.apply(p, xx, ff, g, rng_key=key),
                   params, x, f0)
    print(f"dec.full           {t_full*1e3:8.2f} ms", flush=True)

    # sine source alone
    src = SourceModuleHnNSF(sampling_rate=pc.data.sampling_rate,
                            harmonic_num=0, dtype=dtype)
    sp = {"params": params["params"]["m_source"]}
    upp = int(np.prod(m.upsample_rates))
    t_src = timed(lambda p, ff: src.apply(p, ff, upp, key), sp, f0)
    print(f"dec.sine_source    {t_src*1e3:8.2f} ms", flush=True)

    # resblock trios per stage (fused) — reuse known from bench; here time
    # the whole stage group inside the generator by zeroing out... instead:
    # time generator with fuse off? No — time source + resblocks separately.
    from rvc_tpu.models.nsf import ResBlock1
    from rvc_tpu.models.layers import Conv1d, ConvTranspose1d

    n_k = len(m.resblock_kernel_sizes)
    t_rb_total = 0.0
    t_up_total = 0.0
    t_nc_total = 0.0
    T = Tf
    ch = m.upsample_initial_channel
    har = jnp.asarray(rng.standard_normal((B, Tf * upp, 1)) * 0.1,
                      jnp.float32).astype(dtype)
    for i, (u, kk) in enumerate(zip(m.upsample_rates,
                                    m.upsample_kernel_sizes)):
        c_in = ch // (2 ** i)
        c_cur = ch // (2 ** (i + 1))
        S_up = 128 // c_in if (128 % c_in == 0 and c_in < 128) else 1
        xin = jnp.asarray(rng.standard_normal((B, T, c_in)) * 0.3,
                          jnp.float32).astype(dtype)
        up = ConvTranspose1d(c_in, c_cur, kk, stride=u,
                             padding=(kk - u) // 2, weight_norm=True,
                             s2d=S_up, dtype=dtype)
        pu = fast_init(functools.partial(up.init, jax.random.PRNGKey(2), xin))
        t_up = timed(lambda p, xx: up.apply(p, xx), pu, xin)
        t_up_total += t_up
        T_out = T * u
        # noise conv
        if i + 1 < len(m.upsample_rates):
            stride_f0 = int(np.prod(m.upsample_rates[i + 1:]))
            nc = Conv1d(1, c_cur, kernel_size=stride_f0 * 2, stride=stride_f0,
                        padding=stride_f0 // 2, dtype=dtype)
        else:
            nc = Conv1d(1, c_cur, 1, dtype=dtype)
        pn = fast_init(functools.partial(nc.init, jax.random.PRNGKey(3), har))
        t_nc = timed(lambda p, hh: nc.apply(p, hh), pn, har)
        t_nc_total += t_nc
        # fused resblock trio
        S = 128 // c_cur if (128 % c_cur == 0 and c_cur < 128) else 1
        Tpk = T_out // S
        y = jnp.asarray(rng.standard_normal((B, Tpk, S * c_cur)) * 0.3,
                        jnp.float32).astype(dtype)
        rbs = [ResBlock1(c_cur, rk, tuple(rd), s2d=S, fuse=True, dtype=dtype)
               for rk, rd in zip(m.resblock_kernel_sizes,
                                 m.resblock_dilation_sizes)]
        prs = [fast_init(functools.partial(r.init, jax.random.PRNGKey(4), y))
               for r in rbs]

        def trio(ps, yy, mods=rbs):
            out = None
            for p_, m_ in zip(ps, mods):
                r = m_.apply(p_, yy)
                out = r if out is None else out + r
            return out / n_k

        t_tr = timed(lambda ps, yy: trio(ps, yy), prs, y)
        t_rb_total += t_tr
        print(f"stage{i} C{c_in}->{c_cur}: ups {t_up*1e3:6.2f} ms  "
              f"noise_conv {t_nc*1e3:6.2f} ms  rb_trio {t_tr*1e3:7.2f} ms",
              flush=True)
        T = T_out

    known = t_src + t_up_total + t_nc_total + t_rb_total
    print(f"sum: src {t_src*1e3:.2f} + ups {t_up_total*1e3:.2f} + "
          f"noise {t_nc_total*1e3:.2f} + rb {t_rb_total*1e3:.2f} = "
          f"{known*1e3:.2f} ms; dec.full {t_full*1e3:.2f} ms -> glue "
          f"{(t_full-known)*1e3:.2f} ms", flush=True)


def glue_probe():
    """Time the generator with resblocks replaced by identity: the
    difference vs dec.full isolates the resblocks-in-graph cost; the
    remainder is glue+ups+noise+src as actually fused by XLA."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import functools

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from rvc_tpu.config import preset
    from rvc_tpu.models import nsf as nsf_mod
    from rvc_tpu.models.nsf import GeneratorNSF
    from rvc_tpu.utils.fastinit import fast_init

    pc = preset("48k_v2")
    m = pc.model
    B, SEC = 4, 18.0
    Tf = int(SEC * 100)
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    def timed(apply_fn, params, *xs, n1=3, n2=9):
        @functools.partial(jax.jit, static_argnums=(2,))
        def looped(p, xx, iters):
            def body(i, acc):
                scaled = tuple(
                    a * (1.0 + 1e-6 * i.astype(a.dtype))
                    if jnp.issubdtype(a.dtype, jnp.floating) else a
                    for a in xx)
                y = apply_fn(p, *scaled)
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        def wall(iters):
            float(looped(params, xs, iters))
            t0 = time.perf_counter()
            float(looped(params, xs, iters))
            return time.perf_counter() - t0

        t1, t2 = wall(n1), wall(n2)
        return (t2 - t1) / (n2 - n1)

    class IdRB(nn.Module):
        channels: int
        kernel_size: int = 3
        dilation: tuple = (1, 3, 5)
        s2d: int = 1
        fuse: bool = False
        mesh: object = None
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, x_mask=None):
            # one dummy param so the tree isn't empty
            s = self.param("s", lambda k: jnp.ones((), jnp.float32))
            return x * s.astype(x.dtype)

    gen = GeneratorNSF(
        initial_channel=m.inter_channels, resblock=m.resblock,
        resblock_kernel_sizes=m.resblock_kernel_sizes,
        resblock_dilation_sizes=m.resblock_dilation_sizes,
        upsample_rates=m.upsample_rates,
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=m.upsample_kernel_sizes,
        gin_channels=m.gin_channels, sr=pc.data.sampling_rate,
        fuse_resblocks=True, fuse_group=True, dtype=dtype)

    x = jnp.asarray(rng.standard_normal((B, Tf, m.inter_channels)) * 0.3,
                    jnp.float32).astype(dtype)
    f0 = jnp.asarray(rng.uniform(100, 300, (B, Tf)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 1, m.gin_channels)) * 0.1,
                    jnp.float32).astype(dtype)
    key = jax.random.PRNGKey(0)

    orig = nsf_mod.ResBlock1
    nsf_mod.ResBlock1 = IdRB
    try:
        params = fast_init(functools.partial(
            gen.init, {"params": jax.random.PRNGKey(1)}, x, f0, g,
            rng_key=key))
        t_norb = timed(lambda p, xx, ff: gen.apply(
            p, xx, ff, g, rng_key=key), params, x, f0)
    finally:
        nsf_mod.ResBlock1 = orig
    print(f"dec.no_resblocks   {t_norb*1e3:8.2f} ms "
          f"(= src+ups+noise+glue as fused)", flush=True)


if __name__ == "__main__":
    if os.environ.get("GLUE_ONLY"):
        glue_probe()
    else:
        main()
