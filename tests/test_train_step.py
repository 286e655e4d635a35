"""Training step + balancer + multichip dryrun tests (tiny models, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full GAN step

from rvc_tpu.train import balancer as bal
from rvc_tpu.train import losses as L
from rvc_tpu.parallel.dryrun import make_tiny_batch, tiny_config, run_dryrun
from rvc_tpu.train.step import Trainer


def test_balancer_inactive_passthrough():
    st = bal.init_state(3)
    losses = jnp.asarray([2.0, 3.0, 0.0])
    w0 = jnp.asarray([1.0, 45.0, 1.0])
    total, st2, _ = bal.balance(st, losses, w0, active=False)
    np.testing.assert_allclose(float(total), 2.0 * 1 + 3.0 * 45, rtol=1e-6)


def test_balancer_active_weights():
    st = bal.init_state(2)
    w0 = jnp.asarray([1.0, 45.0])
    losses = jnp.asarray([1.0, 2.0])
    total, st, w = bal.balance(st, losses, w0, active=True)
    assert np.isfinite(float(total)) and float(total) > 0
    # second step: history initialized, weights adapt but stay finite/positive
    total2, st, w2 = bal.balance(st, jnp.asarray([0.9, 2.5]), w0, active=True)
    assert np.isfinite(float(total2))
    assert (np.asarray(w2) > 0).all()
    # weights sum scales with total initial weight budget
    assert float(np.asarray(w2).sum()) == pytest.approx(46.0, rel=0.5)


def test_gan_losses():
    r = [jnp.asarray([0.9, 1.1]), jnp.asarray([1.0])]
    g = [jnp.asarray([0.1, -0.1]), jnp.asarray([0.0])]
    ld, per = L.discriminator_loss(r, g)
    assert len(per) == 2 and float(ld) > 0
    lg, perg = L.generator_loss(g)
    assert float(lg) == pytest.approx(
        float(np.mean((1 - np.array([0.1, -0.1])) ** 2) + 1.0), rel=1e-5
    )


def test_kl_loss_matches_reference_formula(rng):
    B, T, C = 2, 5, 4
    z_p = rng.standard_normal((B, T, C)).astype(np.float32)
    m_p = rng.standard_normal((B, T, C)).astype(np.float32)
    logs_p = (0.1 * rng.standard_normal((B, T, C))).astype(np.float32)
    logs_q = (0.1 * rng.standard_normal((B, T, C))).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)
    mask[1, 3:] = 0
    out = float(L.kl_loss(*map(jnp.asarray, (z_p, logs_q, m_p, logs_p, mask))))
    kl = logs_p - logs_q - 0.5 + 0.5 * (z_p - m_p) ** 2 * np.exp(-2 * logs_p)
    ref = (kl * mask).sum() / mask.sum()
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_hpss_separates(rng):
    # harmonic = constant-in-time rows; percussive = constant-in-freq columns
    T, F = 64, 32
    harm = np.zeros((1, T, F), np.float32)
    harm[:, :, 8] = 1.0  # a horizontal line (steady tone)
    perc = np.zeros((1, T, F), np.float32)
    perc[:, 30, :] = 1.0  # a vertical line (click)
    spec = jnp.asarray(harm + perc)
    h, p = L.hpss(spec, kernel_size=11)
    assert float(h[0, 15, 8]) > float(p[0, 15, 8])  # tone → harmonic
    assert float(p[0, 30, 20]) > float(h[0, 30, 20])  # click → percussive


def test_tefs_envelope(rng):
    x = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    env, phase = L.compute_tefs(x)
    assert env.shape == (2, 256) and phase.shape == (2, 255)
    assert np.isfinite(np.asarray(env)).all()


def test_multiscale_mel_loss(rng):
    msml = L.MultiScaleMelLoss(16000, n_mels=(20, 40))
    x = jnp.asarray((0.2 * rng.standard_normal((1, 4000))).astype(np.float32))
    y = jnp.asarray((0.2 * rng.standard_normal((1, 4000))).astype(np.float32))
    out = msml(x, y)
    assert float(out) > 0
    np.testing.assert_allclose(float(msml(x, x)), 0.0, atol=1e-6)


def test_train_step_runs_and_descends():
    cfg = tiny_config()
    trainer = Trainer(cfg)
    object.__setattr__(trainer.synth, "feature_dim", 16)
    batch = make_tiny_batch(2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.step_fn()
    metrics_hist = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        metrics_hist.append({k: float(v) for k, v in metrics.items()
                             if k != "viz"})
    for m in metrics_hist:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    assert int(state.step) == 3
    # params actually changed
    assert metrics_hist[0]["grad_norm_g"] > 0
    assert metrics_hist[0]["grad_norm_d"] > 0


def test_dryrun_multichip():
    run_dryrun(4)


def test_train_step_with_gradient_penalty():
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, c_gp=1.0))
    trainer = Trainer(cfg)
    object.__setattr__(trainer.synth, "feature_dim", 16)
    batch = make_tiny_batch(2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.step_fn()(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_disc_all"]))
    assert float(metrics["grad_norm_d"]) > 0


def test_flat_adamw_matches_optax():
    """FlatAdamW (raveled single-vector AdamW) must track optax.adamw
    step-for-step: same bias correction, schedule indexing, and decoupled
    weight decay on every param."""
    import optax

    from rvc_tpu.train.step import FlatAdamW, make_optax_adamw

    rng = np.random.default_rng(0)
    params = {
        "a": {"w": jnp.asarray(rng.standard_normal((5, 3)), jnp.float32),
              "b": jnp.asarray(rng.standard_normal((3,)), jnp.float32)},
        "c": jnp.asarray(rng.standard_normal((2, 2, 4)), jnp.float32),
    }
    sched = lambda step: 1e-3 * (0.9 ** step)  # noqa: E731
    tx_ref = make_optax_adamw(sched, betas=(0.8, 0.99), eps=1e-9)
    tx_flat = FlatAdamW(sched, betas=(0.8, 0.99), eps=1e-9)
    s_ref = tx_ref.init(params)
    s_flat = tx_flat.init(params)
    p_ref = p_flat = params
    for i in range(4):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(i).standard_normal(p.shape), jnp.float32),
            p_ref)
        upd, s_ref = tx_ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        p_flat, s_flat = tx_flat.apply(grads, s_flat, p_flat)
        for leaf_r, leaf_f in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_flat)):
            np.testing.assert_allclose(np.asarray(leaf_f), np.asarray(leaf_r),
                                       atol=1e-7, rtol=1e-6)


def test_grouped_adamw_matches_optax():
    """GroupedAdamW (flat small leaves + per-leaf big leaves) must track
    optax.adamw step-for-step across the size threshold — the r5 default
    optimizer for the kernel-count-bound GAN step."""
    import optax

    from rvc_tpu.train.step import GroupedAdamW, make_optax_adamw

    rng = np.random.default_rng(0)
    # leaves on BOTH sides of the 64-element threshold used below
    params = {
        "small1": jnp.asarray(rng.standard_normal((5, 3)), jnp.float32),
        "small2": {"b": jnp.asarray(rng.standard_normal((7,)), jnp.float32)},
        "big1": jnp.asarray(rng.standard_normal((16, 8)), jnp.float32),
        "big2": jnp.asarray(rng.standard_normal((4, 4, 8)), jnp.float32),
    }
    sched = lambda step: 1e-3 * (0.9 ** step)  # noqa: E731
    tx_ref = make_optax_adamw(sched, betas=(0.8, 0.99), eps=1e-9)
    tx_grp = GroupedAdamW(sched, betas=(0.8, 0.99), eps=1e-9,
                          small_threshold=64)
    s_ref = tx_ref.init(params)
    s_grp = tx_grp.init(params)
    assert s_grp["m_flat"].shape == (15 + 7,)
    assert len(s_grp["m_big"]) == 2
    p_ref = p_grp = params
    for i in range(4):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(i).standard_normal(p.shape), jnp.float32),
            p_ref)
        upd, s_ref = tx_ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        p_grp, s_grp = tx_grp.apply(grads, s_grp, p_grp)
        for leaf_r, leaf_g in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_grp)):
            np.testing.assert_allclose(np.asarray(leaf_g), np.asarray(leaf_r),
                                       atol=1e-7, rtol=1e-6)


def test_grouped_adamw_state_from_trees():
    from rvc_tpu.train.step import GroupedAdamW

    params = {"big": jnp.ones((16, 8)), "small": jnp.zeros((3,))}
    m_tree = jax.tree.map(lambda p: p * 0.5, params)
    v_tree = jax.tree.map(lambda p: p * 0.25 + 1.0, params)
    tx = GroupedAdamW(lambda s: 1e-3, small_threshold=64)
    st = tx.state_from_trees(m_tree, v_tree, 7, params)
    assert int(st["count"]) == 7
    # tree_leaves order is alphabetical: big first, small second
    np.testing.assert_allclose(np.asarray(st["m_big"][0]), 0.5)
    np.testing.assert_allclose(np.asarray(st["m_flat"]), 0.0)
    np.testing.assert_allclose(np.asarray(st["v_flat"]), 1.0)


def test_flat_adamw_state_from_trees():
    from jax.flatten_util import ravel_pytree

    from rvc_tpu.train.step import FlatAdamW

    params = {"w": jnp.ones((2, 3)), "b": jnp.zeros((3,))}
    m_tree = jax.tree.map(lambda p: p * 0.5, params)
    v_tree = jax.tree.map(lambda p: p * 0.25 + 1.0, params)
    tx = FlatAdamW(lambda s: 1e-3)
    st = tx.state_from_trees(m_tree, v_tree, 7, params)
    assert int(st["count"]) == 7
    np.testing.assert_allclose(np.asarray(st["m"]),
                               np.asarray(ravel_pytree(m_tree)[0]))
