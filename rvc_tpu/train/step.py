"""The GAN training step (reference training_cli.py:374-602, jit-compiled).

One fused step per batch:
  1. generator forward via jax.vjp (forward runs ONCE; its pullback later
     carries the G gradients — the reference pays two backward graphs
     through autograd, we pay one forward + two pullback passes),
  2. discriminator update on (real, stop_grad(fake)) with the adaptive
     balancer,
  3. generator update through the *updated* discriminator (exactly the
     reference's ordering) with mel/KL/FM/adversarial/aux losses balanced,
  4. both optimizers are optax.adamw chains with per-epoch exponential lr
     decay applied outside.

Everything — including the loss balancer EMA state — lives in TrainState,
so the step is a pure function: jit it with a dp-sharded batch and
replicated params and XLA handles the gradient all-reduce (see
parallel/mesh.py).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import RVCConfig
from ..models.discriminator import MultiPeriodDiscriminator
from ..models.layers import slice_segments
from ..models.synthesizer import Synthesizer
from ..ops.mel import mel_spectrogram, spec_to_mel
from . import balancer as bal
from . import losses as L

G_LOSS_KEYS = ("loss_gen", "loss_fm", "loss_mel", "loss_kl",
               "harmonic_loss", "tsi_loss", "tefs_loss")
D_LOSS_KEYS = ("loss_disc", "gradient_penalty")


class TrainState(NamedTuple):
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    step: jax.Array
    balancer_g: bal.BalancerState
    balancer_d: bal.BalancerState


def make_optax_adamw(lr_schedule, betas=(0.8, 0.99), eps=1e-9, weight_decay=0.01):
    """Plain optax AdamW (kept for the torch-state importer and as the
    semantic reference for FlatAdamW)."""
    return optax.adamw(
        learning_rate=lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=weight_decay,
    )


class FlatAdamW:
    """AdamW over ONE raveled parameter vector — optax.adamw semantics
    (same bias correction, decoupled weight decay on every param, schedule
    indexed by pre-increment count), ~600× fewer kernels.

    Why: the GAN step is kernel-count bound on TPU (measured r4: per-leaf
    optax updates over 560 G + 165 D leaves cost 6.6 ms of an 89 ms step;
    the raveled form measures 2.5 ms). State: {count, m, v} with flat m/v.
    ``apply`` returns the UPDATED params tree directly (updating inside
    the flat space is the point — per-leaf apply_updates would reintroduce
    the kernels).
    """

    def __init__(self, lr_schedule, betas=(0.8, 0.99), eps=1e-9,
                 weight_decay=0.01):
        self.sched = lr_schedule
        self.b1, self.b2 = betas
        self.eps = eps
        self.wd = weight_decay

    def init(self, params):
        from jax.flatten_util import ravel_pytree

        flat, _ = ravel_pytree(params)
        flat = flat.astype(jnp.float32)
        return {"count": jnp.zeros((), jnp.int32),
                "m": jnp.zeros_like(flat), "v": jnp.zeros_like(flat)}

    def apply(self, grads, state, params):
        """(grads_tree, state, params_tree) -> (new_params_tree, new_state)."""
        from jax.flatten_util import ravel_pytree

        g, _ = ravel_pytree(grads)
        p, unravel = ravel_pytree(params)
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        c = state["count"] + 1
        m = self.b1 * state["m"] + (1.0 - self.b1) * g
        v = self.b2 * state["v"] + (1.0 - self.b2) * jnp.square(g)
        mh = m / (1.0 - self.b1 ** c.astype(jnp.float32))
        vh = v / (1.0 - self.b2 ** c.astype(jnp.float32))
        lr = self.sched(state["count"])
        p2 = p32 - lr * (mh / (jnp.sqrt(vh) + self.eps) + self.wd * p32)
        return unravel(p2.astype(p.dtype)), {"count": c, "m": m, "v": v}

    def state_from_trees(self, m_tree, v_tree, count, params):
        """Build flat state from param-shaped moment trees (the torch
        Adam resume path: compat/optimizer_import fills optax-shaped
        trees; ravel order matches params since the trees are congruent)."""
        from jax.flatten_util import ravel_pytree

        del params
        return {"count": jnp.asarray(count, jnp.int32),
                "m": ravel_pytree(m_tree)[0].astype(jnp.float32),
                "v": ravel_pytree(v_tree)[0].astype(jnp.float32)}


class GroupedAdamW:
    """AdamW with the small parameter leaves updated in ONE flat f32 vector
    and the large leaves per-leaf — optax.adamw semantics on both sides
    (same bias correction, decoupled weight decay, schedule indexed by the
    pre-increment count, parity-tested vs optax).

    Why hybrid: the GAN step is kernel-count bound (r4 census: ~830
    standalone per-leaf optimizer adds, most from the hundreds of small
    weight-norm g/bias leaves), but fully raveling the space (FlatAdamW)
    REGRESSES the step — large conv kernels lose their tiled layouts and
    every consumer pays a relayout copy. Grouping only leaves below
    ``small_threshold`` elements (default 64k) collapses ~80% of the leaf
    count into one vector update while every large conv kernel keeps its
    native layout and donated aliasing. Measured r5 (48k_v2, batch 4):
    see BASELINE.md round-5 table.
    """

    def __init__(self, lr_schedule, betas=(0.8, 0.99), eps=1e-9,
                 weight_decay=0.01, small_threshold=65536):
        self.sched = lr_schedule
        self.b1, self.b2 = betas
        self.eps = eps
        self.wd = weight_decay
        self.thr = small_threshold

    def _split(self, leaves):
        small = [i for i, l in enumerate(leaves) if l.size < self.thr]
        big = [i for i, l in enumerate(leaves) if l.size >= self.thr]
        return small, big

    def init(self, params):
        leaves = jax.tree_util.tree_leaves(params)
        small, big = self._split(leaves)
        n_small = sum(leaves[i].size for i in small)
        return {
            "count": jnp.zeros((), jnp.int32),
            "m_flat": jnp.zeros((n_small,), jnp.float32),
            "v_flat": jnp.zeros((n_small,), jnp.float32),
            "m_big": [jnp.zeros(leaves[i].shape, jnp.float32) for i in big],
            "v_big": [jnp.zeros(leaves[i].shape, jnp.float32) for i in big],
        }

    def apply(self, grads, state, params):
        """(grads_tree, state, params_tree) -> (new_params_tree, new_state)."""
        new_params, new_state, _ = self.apply_with_norm(grads, state, params)
        return new_params, new_state

    def apply_with_norm(self, grads, state, params):
        """Like ``apply`` but also returns the global grad norm, computed
        incrementally from the buffers the update already touches — the
        step's standalone optax.global_norm metric was ~1,100 entry
        instructions of per-leaf square/sum/add (r5 census) for a number
        that only feeds TensorBoard."""
        g_leaves = jax.tree_util.tree_leaves(grads)
        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        small, big = self._split(p_leaves)
        c = state["count"] + 1
        cf = c.astype(jnp.float32)
        bc1 = 1.0 - self.b1 ** cf
        bc2 = 1.0 - self.b2 ** cf
        lr = self.sched(state["count"])
        new_leaves: list = list(p_leaves)
        sumsq = jnp.float32(0.0)

        m_flat, v_flat = state["m_flat"], state["v_flat"]
        if small:
            gf = jnp.concatenate(
                [g_leaves[i].ravel() for i in small]).astype(jnp.float32)
            pf = jnp.concatenate(
                [p_leaves[i].ravel() for i in small]).astype(jnp.float32)
            sumsq = sumsq + jnp.sum(jnp.square(gf))
            m_flat = self.b1 * m_flat + (1.0 - self.b1) * gf
            v_flat = self.b2 * v_flat + (1.0 - self.b2) * jnp.square(gf)
            p2 = pf - lr * ((m_flat / bc1) / (jnp.sqrt(v_flat / bc2) + self.eps)
                            + self.wd * pf)
            off = 0
            for i in small:
                n = p_leaves[i].size
                new_leaves[i] = p2[off : off + n].reshape(
                    p_leaves[i].shape).astype(p_leaves[i].dtype)
                off += n

        m_big, v_big = [], []
        big_sq = []
        for j, i in enumerate(big):
            g32 = g_leaves[i].astype(jnp.float32)
            p32 = p_leaves[i].astype(jnp.float32)
            g2 = jnp.square(g32)
            big_sq.append(jnp.sum(g2))
            m = self.b1 * state["m_big"][j] + (1.0 - self.b1) * g32
            v = self.b2 * state["v_big"][j] + (1.0 - self.b2) * g2
            new_leaves[i] = (
                p32 - lr * ((m / bc1) / (jnp.sqrt(v / bc2) + self.eps)
                            + self.wd * p32)).astype(p_leaves[i].dtype)
            m_big.append(m)
            v_big.append(v)
        if big_sq:
            sumsq = sumsq + jnp.sum(jnp.stack(big_sq))

        new_state = {"count": c, "m_flat": m_flat, "v_flat": v_flat,
                     "m_big": m_big, "v_big": v_big}
        return (jax.tree_util.tree_unflatten(treedef, new_leaves), new_state,
                jnp.sqrt(sumsq))

    def state_from_trees(self, m_tree, v_tree, count, params):
        """Grouped state from param-congruent moment trees (torch Adam
        resume: compat/optimizer_import fills congruent trees)."""
        m_leaves = jax.tree_util.tree_leaves(m_tree)
        v_leaves = jax.tree_util.tree_leaves(v_tree)
        p_leaves = jax.tree_util.tree_leaves(params)
        small, big = self._split(p_leaves)
        cat = (lambda ls, idx: jnp.concatenate(
            [jnp.asarray(ls[i]).ravel() for i in idx]).astype(jnp.float32)
            if idx else jnp.zeros((0,), jnp.float32))
        return {
            "count": jnp.asarray(count, jnp.int32),
            "m_flat": cat(m_leaves, small), "v_flat": cat(v_leaves, small),
            "m_big": [jnp.asarray(m_leaves[i], jnp.float32) for i in big],
            "v_big": [jnp.asarray(v_leaves[i], jnp.float32) for i in big],
        }


class _OptaxApply:
    """optax.adamw with the (grads, state, params) -> (new_params, state)
    interface the step uses. Measured on-chip (r4): the per-leaf form is
    6.6 ms/step vs FlatAdamW's 2.5 ms standalone, BUT the flat form
    regresses the FULL step 13.7 -> 5.6 steps/s — unraveled weights lose
    their tiled conv layouts and every consumer pays a relayout copy. The
    per-leaf update keeps donated aliasing and native layouts; FlatAdamW
    remains available for non-conv parameter spaces."""

    def __init__(self, tx):
        self.tx = tx

    def init(self, params):
        return self.tx.init(params)

    def apply(self, grads, state, params):
        updates, new_state = self.tx.update(grads, state, params)
        return optax.apply_updates(params, updates), new_state


def make_optimizer(lr_schedule, betas=(0.8, 0.99), eps=1e-9, weight_decay=0.01):
    """AdamW matching torch defaults (reference training_cli.py:209-239).

    RVC_TPU_OPT selects the implementation: ``grouped`` (default — hybrid
    flat-small/per-leaf-big, see GroupedAdamW), ``optax`` (plain per-leaf),
    ``flat`` (fully raveled; regresses conv layouts, kept for non-conv
    spaces)."""
    import os

    kind = os.environ.get("RVC_TPU_OPT", "grouped")
    if kind == "flat":
        return FlatAdamW(lr_schedule, betas, eps, weight_decay)
    if kind == "optax":
        return _OptaxApply(make_optax_adamw(lr_schedule, betas, eps,
                                            weight_decay))
    if kind != "grouped":
        raise ValueError(f"RVC_TPU_OPT={kind!r}: expected grouped|optax|flat")
    return GroupedAdamW(lr_schedule, betas, eps, weight_decay)


def lr_schedule(base_lr: float, lr_decay: float, steps_per_epoch: int):
    """Per-epoch exponential decay (reference ExponentialLR, :275-280)."""
    def fn(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (lr_decay ** epoch)

    return fn


class Trainer:
    """Owns the models/optimizers and the jitted step."""

    def __init__(self, config: RVCConfig, dtype=jnp.float32, balancer_active=True,
                 fuse_resblocks: bool | None = None,
                 pack_discriminator: bool | None = None):
        self.config = config
        self.dtype = dtype
        self.balancer_active = balancer_active
        if fuse_resblocks is None:
            # auto: the fused chain (forward + custom-VJP backward Pallas
            # kernels) on a single real TPU chip; unfused under a
            # multi-chip mesh (the kernels carry no GSPMD partition rules)
            # and on CPU (interpreter would dominate the virtual-mesh
            # dryrun)
            fuse_resblocks = (jax.default_backend() in ("tpu", "axon")
                              and jax.device_count() == 1)
        if pack_discriminator is None:
            # period-pair packed ensemble (models/discriminator.py
            # packed_mpd_apply). MEASURED SLOWER on v5e (see its
            # docstring: grouped-conv bwd + pair padding beat the halved
            # launch count; step 13.6 → 11.8 steps/s), so the default is
            # OFF everywhere; RVC_TPU_PACK_DISC=1 opts in for re-measure
            # on other topologies/hardware.
            import os

            pack_discriminator = (
                os.environ.get("RVC_TPU_PACK_DISC") == "1"
                and config.model.disc_scale == 1.0)
        self.pack_discriminator = pack_discriminator
        self.synth = Synthesizer.from_config(
            config.model, config.data, config.train.segment_size, dtype=dtype,
            fuse_resblocks=fuse_resblocks, fuse_wn=fuse_resblocks,
        )
        self.disc = MultiPeriodDiscriminator(
            version=config.model.version, dtype=dtype,
            scale=config.model.disc_scale)
        self.msml = None  # optional MultiScaleMelLoss, set via use_multiscale()
        self.seg_frames = config.train.segment_size // config.data.hop_length
        self._step_fn = None
        self._eval_fn = None

    def use_multiscale(self, **kwargs):
        self.msml = L.MultiScaleMelLoss(self.config.data.sampling_rate, **kwargs)

    # -- init ----------------------------------------------------------------
    def init_state(self, rng: jax.Array, batch: dict, steps_per_epoch: int = 100,
                   fast_params: bool = False) -> TrainState:
        """``fast_params``: materialize random params from eval_shape instead
        of compiling+running the init graphs (utils.fastinit) — init compile
        dominates wall time on 1-core hosts; dryruns/structure tests only
        need *some* finite params, not the init distribution."""
        import functools

        t = self.config.train
        kg, kd, kn = jax.random.split(rng, 3)
        g_init = functools.partial(
            self.synth.init, {"params": kg, "noise": kn},
            batch["phone"], batch["phone_lengths"],
            batch.get("pitch"), batch.get("pitchf"),
            batch["spec"], batch["spec_lengths"], batch["sid"],
        )
        seg = jnp.zeros((batch["wave"].shape[0], t.segment_size, 1), self.dtype)
        d_init = functools.partial(self.disc.init, kd, seg, seg)
        if fast_params:
            from ..utils.fastinit import fast_init

            params_g = fast_init(g_init, seed=0)
            params_d = fast_init(d_init, seed=1)
        else:
            params_g = g_init()
            params_d = d_init()
        self.sched_g = lr_schedule(t.learning_rate, t.lr_decay, steps_per_epoch)
        self.sched_d = lr_schedule(t.learning_rate, t.lr_decay, steps_per_epoch)
        self.tx_g = make_optimizer(self.sched_g, t.betas, t.eps)
        self.tx_d = make_optimizer(self.sched_d, t.betas, t.eps)
        return TrainState(
            params_g=params_g,
            params_d=params_d,
            opt_g=self.tx_g.init(params_g["params"]),
            opt_d=self.tx_d.init(params_d["params"]),
            step=jnp.zeros((), jnp.int32),
            balancer_g=bal.init_state(len(G_LOSS_KEYS)),
            balancer_d=bal.init_state(len(D_LOSS_KEYS)),
        )

    # -- the step -------------------------------------------------------------
    def _build_step(self):
        cfg = self.config
        t, d = cfg.train, cfg.data
        synth, disc = self.synth, self.disc
        if self.pack_discriminator:
            from ..models.discriminator import packed_mpd_apply

            disc_apply = functools.partial(packed_mpd_apply, disc)
        else:
            disc_apply = disc.apply
        seg_frames = self.seg_frames
        use_f0 = cfg.model.use_f0
        msml = self.msml
        balancer_active = self.balancer_active

        g_initial = jnp.asarray(
            [1.0, 1.0, t.c_mel, t.c_kl, t.c_hd, t.c_tsi, t.c_tefs], jnp.float32
        )
        d_initial = jnp.asarray([1.0, 1.0 if t.c_gp > 0 else 0.0], jnp.float32)

        def g_forward(params_g, batch, noise_key):
            return synth.apply(
                params_g,
                batch["phone"], batch["phone_lengths"],
                batch.get("pitch"), batch.get("pitchf"),
                batch["spec"], batch["spec_lengths"], batch["sid"],
                rngs={"noise": noise_key},
            )

        def step(state: TrainState, batch: dict, key: jax.Array) -> tuple[TrainState, dict]:
            k_noise, _ = jax.random.split(key)

            # ---- generator forward once, keep the pullback
            (y_hat, ids_slice, x_mask, z_mask, flows), g_vjp = jax.vjp(
                lambda pg: g_forward(pg, batch, k_noise), state.params_g
            )
            z, z_p, m_p, logs_p, m_q, logs_q = flows
            wave_seg = slice_segments(
                batch["wave"][..., None], ids_slice * d.hop_length, t.segment_size
            )  # (B, seg, 1)

            # ---- mel targets (reference :521-546)
            mel = spec_to_mel(batch["spec"], d.filter_length, d.n_mel_channels,
                              d.sampling_rate, d.mel_fmin, d.mel_fmax)
            y_mel = slice_segments(mel, ids_slice, seg_frames)
            y_hat_f = y_hat[..., 0].astype(jnp.float32)
            y_hat_mel = mel_spectrogram(
                y_hat_f, d.filter_length, d.n_mel_channels, d.sampling_rate,
                d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax,
            )

            # ---- discriminator update (fake detached)
            fake = jax.lax.stop_gradient(y_hat)

            def d_loss_fn(params_d, bstate):
                y_d_r, y_d_g, _, _ = disc_apply(params_d, wave_seg, fake)
                loss_disc, _ = L.discriminator_loss(y_d_r, y_d_g)
                if t.c_gp > 0:
                    # gradient penalty on a random real/fake interpolation
                    # (reference losses.gradient_norm_loss :401-426)
                    k_alpha = jax.random.fold_in(key, 1)
                    alpha = jax.random.uniform(k_alpha, (wave_seg.shape[0], 1, 1))
                    interp = alpha * wave_seg + (1.0 - alpha) * fake

                    def d_out(x):
                        r, g_, _, _ = disc_apply(params_d, wave_seg, x)
                        ld, _ = L.discriminator_loss(r, g_)
                        return ld

                    grads_x = jax.grad(d_out)(interp)
                    gnorm = jnp.sqrt(
                        jnp.sum(jnp.square(grads_x.reshape(grads_x.shape[0], -1)),
                                axis=-1) + 1e-12)
                    gp = jnp.mean((gnorm - 1.0) ** 2) * t.c_gp
                else:
                    gp = jnp.float32(0.0)
                losses_vec = jnp.stack([loss_disc, gp])
                total, new_b, _ = bal.balance(bstate, losses_vec, d_initial,
                                              active=balancer_active)
                return total, (loss_disc, new_b)

            (loss_d_all, (loss_disc, new_bd)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.params_d, state.balancer_d)
            if hasattr(self.tx_d, "apply_with_norm"):
                new_pd, new_opt_d, grad_norm_d = self.tx_d.apply_with_norm(
                    d_grads["params"], state.opt_d, state.params_d["params"])
            else:
                new_pd, new_opt_d = self.tx_d.apply(
                    d_grads["params"], state.opt_d, state.params_d["params"])
                grad_norm_d = optax.global_norm(d_grads["params"])
            new_params_d = {"params": new_pd}

            # ---- generator update through the UPDATED discriminator
            def g_loss_fn(y_hat_in, y_hat_mel_in, flows_in, bstate):
                z_p_, logs_q_, m_p_, logs_p_ = flows_in
                y_d_r, y_d_g, fmap_r, fmap_g = disc_apply(new_params_d, wave_seg, y_hat_in)
                if msml is not None:
                    loss_mel = msml(y_hat_in[..., 0].astype(jnp.float32),
                                    wave_seg[..., 0].astype(jnp.float32))
                else:
                    loss_mel = L.mel_l1(y_mel, y_hat_mel_in)
                loss_kl = L.kl_loss(z_p_, logs_q_, m_p_, logs_p_, z_mask)
                loss_fm = L.feature_loss(fmap_r, fmap_g)
                loss_gen, _ = L.generator_loss(y_d_g)
                harmonic, tefs, tsi = L.combined_aux_loss(
                    wave_seg[..., 0].astype(jnp.float32),
                    y_hat_in[..., 0].astype(jnp.float32),
                    c_tefs=t.c_tefs, c_hd=t.c_hd, c_tsi=t.c_tsi,
                    n_mels=d.n_mel_channels, sample_rate=d.sampling_rate,
                    n_fft=d.filter_length, hop_length=d.hop_length,
                    win_length=d.win_length, fmin=d.mel_fmin, fmax=d.mel_fmax,
                    eps=t.eps,
                )
                losses_vec = jnp.stack([
                    loss_gen, loss_fm, loss_mel, loss_kl, harmonic, tsi, tefs
                ])
                total, new_b, weights = bal.balance(bstate, losses_vec, g_initial,
                                                    active=balancer_active)
                aux = {
                    "loss_gen": loss_gen, "loss_fm": loss_fm, "loss_mel": loss_mel,
                    "loss_kl": loss_kl, "harmonic_loss": harmonic, "tsi_loss": tsi,
                    "tefs_loss": tefs, "loss_gen_all": total, "balancer": new_b,
                }
                return total, aux

            # grads of the G loss wrt (y_hat, y_hat_mel, flow stats) …
            flows_for_loss = (z_p, logs_q, m_p, logs_p)
            (loss_g_all, g_aux), out_grads = jax.value_and_grad(
                g_loss_fn, argnums=(0, 1, 2), has_aux=True
            )(y_hat, y_hat_mel, flows_for_loss, state.balancer_g)
            gy, gym, gflows = out_grads
            gz_p, glogs_q, gm_p, glogs_p = gflows

            # … chain y_hat_mel grad through the mel frontend into y_hat
            _, mel_vjp = jax.vjp(
                lambda w: mel_spectrogram(
                    w[..., 0].astype(jnp.float32), d.filter_length, d.n_mel_channels,
                    d.sampling_rate, d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax,
                ),
                y_hat,
            )
            gy = gy + mel_vjp(gym)[0].astype(gy.dtype)

            # … and pull everything back through the generator in ONE pass
            import numpy as _np

            zeros = lambda a: jnp.zeros_like(a)  # noqa: E731
            # integer outputs take float0 cotangents
            ids_cot = _np.zeros(ids_slice.shape, jax.dtypes.float0)
            cotangents = (
                gy, ids_cot, zeros(x_mask), zeros(z_mask),
                (zeros(z), gz_p.astype(z_p.dtype), gm_p.astype(m_p.dtype),
                 glogs_p.astype(logs_p.dtype), zeros(m_q),
                 glogs_q.astype(logs_q.dtype)),
            )
            g_grads = g_vjp(cotangents)[0]

            if hasattr(self.tx_g, "apply_with_norm"):
                new_pg, new_opt_g, grad_norm_g = self.tx_g.apply_with_norm(
                    g_grads["params"], state.opt_g, state.params_g["params"])
            else:
                new_pg, new_opt_g = self.tx_g.apply(
                    g_grads["params"], state.opt_g, state.params_g["params"])
                grad_norm_g = optax.global_norm(g_grads["params"])
            new_params_g = {"params": new_pg}

            metrics = {
                "loss_disc": loss_disc, "loss_disc_all": loss_d_all,
                "grad_norm_g": grad_norm_g, "grad_norm_d": grad_norm_d,
                **{k: v for k, v in g_aux.items() if k != "balancer"},
                # first-sample tensors for TensorBoard images/audio
                # (reference training_cli.py:639-655); device arrays —
                # downloaded only on log steps
                "viz": {
                    "y_mel": y_mel[0], "y_hat_mel": y_hat_mel[0],
                    "wave_org": wave_seg[0, :, 0],
                    "wave_gen": y_hat_f[0],
                },
            }
            new_state = TrainState(
                params_g=new_params_g, params_d=new_params_d,
                opt_g=new_opt_g, opt_d=new_opt_d,
                step=state.step + 1,
                balancer_g=g_aux["balancer"], balancer_d=new_bd,
            )
            return new_state, metrics

        return step

    def step_fn(self):
        if self._step_fn is None:
            self._step_fn = jax.jit(self._build_step(), donate_argnums=(0,))
        return self._step_fn

    def eval_fn(self):
        """Jitted held-out evaluation: generator forward (no grads, no
        discriminator) → sliced mel L1. The reference has no eval pass at
        all (training_cli.py logs train-slice mel only); this is the knob a
        user needs to see divergence/overfit on data the GAN never trains
        on."""
        if self._eval_fn is None:
            cfg = self.config
            d, synth, seg_frames = cfg.data, self.synth, self.seg_frames

            def ev(params_g, batch, key):
                y_hat, ids_slice, _, _, _ = synth.apply(
                    params_g,
                    batch["phone"], batch["phone_lengths"],
                    batch.get("pitch"), batch.get("pitchf"),
                    batch["spec"], batch["spec_lengths"], batch["sid"],
                    rngs={"noise": key},
                )
                mel = spec_to_mel(batch["spec"], d.filter_length,
                                  d.n_mel_channels, d.sampling_rate,
                                  d.mel_fmin, d.mel_fmax)
                y_mel = slice_segments(mel, ids_slice, seg_frames)
                y_hat_mel = mel_spectrogram(
                    y_hat[..., 0].astype(jnp.float32), d.filter_length,
                    d.n_mel_channels, d.sampling_rate, d.hop_length,
                    d.win_length, d.mel_fmin, d.mel_fmax,
                )
                return L.mel_l1(y_mel, y_hat_mel)

            self._eval_fn = jax.jit(ev)
        return self._eval_fn
