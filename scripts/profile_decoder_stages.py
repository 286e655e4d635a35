"""Per-stage timing of the 48k_v2 NSF generator decode (B=4, 18 s chunks):
ConvTranspose upsample vs the 3-kernel resblock trio at each stage, with
the current s2d packing. Targets the Pallas fusion decision.

Timing note: over the axon tunnel ``block_until_ready`` acks dispatch
before execution finishes, so single-call timing reads ~0. We instead
iterate INSIDE one jitted program with an iteration-dependent input
(XLA cannot hoist it) and fetch a scalar; per-iter time = (t(N2) -
t(N1)) / (N2 - N1), which also cancels the fixed dispatch latency.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_timer(jax, jnp):
    from functools import partial

    def timed(apply_fn, params, x, n1=4, n2=12):
        @partial(jax.jit, static_argnums=(2,))
        def looped(p, xx, iters):
            def body(i, acc):
                y = apply_fn(p, xx * (1.0 + 1e-6 * i.astype(xx.dtype)))
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        def wall(iters):
            float(looped(params, x, iters))  # compile + warm
            t0 = time.perf_counter()
            float(looped(params, x, iters))
            return time.perf_counter() - t0

        t1, t2 = wall(n1), wall(n2)
        return (t2 - t1) / (n2 - n1)

    return timed


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_tpu.models.layers import ConvTranspose1d
    from rvc_tpu.models.nsf import ResBlock1

    timed = make_timer(jax, jnp)

    B = 4
    T0 = 1800  # 18 s at 100 Hz
    rates = (12, 10, 2, 2)
    kerns = (24, 20, 4, 4)
    ch0 = 512
    rng = np.random.default_rng(0)
    rb_ks = (3, 7, 11)
    rb_ds = ((1, 3, 5),) * 3

    order = [int(a) for a in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else range(len(rates)))]
    for i in order:  # dominant (late, long-T) stages first when reversed
        u, k = rates[i], kerns[i]
        T = T0 * int(np.prod(rates[:i]))
        cin = ch0 // (2 ** i)
        cout = ch0 // (2 ** (i + 1))
        x = jnp.asarray(rng.standard_normal((B, T, cin)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        up = ConvTranspose1d(cin, cout, k, stride=u, padding=(k - u) // 2,
                             weight_norm=True, dtype=jnp.bfloat16)
        pu = up.init(jax.random.PRNGKey(i), x)
        t_up = timed(lambda p, xx: up.apply(p, xx), pu, x)
        T_out = T * u
        y = jnp.asarray(rng.standard_normal((B, T_out, cout)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        S = 128 // cout if (128 % cout == 0 and cout < 128) else 1
        if S > 1 and T_out % S:
            S = 1
        ypk = y.reshape(B, T_out // S, S * cout) if S > 1 else y

        rbs = [ResBlock1(cout, rk, rd, s2d=S, dtype=jnp.bfloat16)
               for rk, rd in zip(rb_ks, rb_ds)]
        prs = [rb.init(jax.random.PRNGKey(100 + i * 3 + j), ypk)
               for j, rb in enumerate(rbs)]
        rbs_f = [ResBlock1(cout, rk, rd, s2d=S, fuse=True, dtype=jnp.bfloat16)
                 for rk, rd in zip(rb_ks, rb_ds)]

        def trio(ps, yy, mods):
            xs = None
            for rb, p in zip(mods, ps):
                r = rb.apply(p, yy)
                xs = r if xs is None else xs + r
            return xs / 3.0

        t_tr = timed(lambda ps, yy: trio(ps, yy, rbs), prs, ypk)
        t_fu = timed(lambda ps, yy: trio(ps, yy, rbs_f), prs, ypk)
        gb = B * T_out * cout * 2 / 1e9
        print(f"stage{i} C{cin}->{cout} T{T}->{T_out} s2d={S}: "
              f"up {t_up*1e3:7.2f} ms  resblocks {t_tr*1e3:7.2f} ms  "
              f"fused {t_fu*1e3:7.2f} ms ({t_tr/max(t_fu,1e-9):.2f}x) "
              f"(activation {gb*1e3:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
