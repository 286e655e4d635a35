"""Checkpoint tools, speaker-mix inference, StableHLO export, AudioProcessor."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models import TINY


def _mk_params(net, seed):
    from conftest import finit

    return finit(
        net, jnp.zeros((1, 8, 24)), jnp.array([8]), jnp.ones((1, 8), jnp.int32),
        jnp.full((1, 8), 150.0), jnp.array([0]), method=net.infer,
        rngs={"params": jax.random.PRNGKey(seed), "noise": jax.random.PRNGKey(1)},
        seed=seed,
    )


CFG = [129, 16, 16, 16, 32, 2, 2, 3, 0.0, "1", [3, 5], [[1, 3], [1, 3]],
       [10, 4, 2, 2], 32, [16, 8, 4, 4], 4, 8, 16000]


@pytest.mark.heavy
def test_process_ckpt_merge_and_info(tmp_path):
    from rvc_tpu.compat import process_ckpt as PC
    from rvc_tpu.compat.torch_export import save_rvc_checkpoint
    from rvc_tpu.compat.torch_import import load_rvc_checkpoint
    from rvc_tpu.models.synthesizer import Synthesizer

    net = Synthesizer(**TINY)
    a, b = str(tmp_path / "a.pth"), str(tmp_path / "b.pth")
    save_rvc_checkpoint(a, _mk_params(net, 0), CFG, sr=16000, version="v2")
    save_rvc_checkpoint(b, _mk_params(net, 9), CFG, sr=16000, version="v2")
    assert "16000" in PC.show_info(a)
    m = str(tmp_path / "m.pth")
    assert PC.merge(a, b, 0.5, 16000, 1, "blend", m, "v2") == "Success."
    params, meta = load_rvc_checkpoint(m)
    assert meta["sr"] == 16000 and meta["version"] == "v2"
    assert PC.change_info(m, "tag", str(tmp_path / "m2.pth")) == "Success."


@pytest.mark.heavy
def test_infer_mix(rng):
    from rvc_tpu.models.synthesizer import Synthesizer

    net = Synthesizer(**TINY)
    params = _mk_params(net, 0)
    phone = jnp.asarray(rng.standard_normal((1, 8, 24)).astype(np.float32))
    mix = jnp.asarray([[0.5, 0.5, 0.0, 0.0]])
    o, _, _ = net.apply(
        params, phone, jnp.array([8]), jnp.ones((1, 8), jnp.int32),
        jnp.full((1, 8), 150.0), mix, method=net.infer_mix,
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    assert o.shape == (1, 8 * 160, 1)
    assert np.isfinite(np.asarray(o)).all()
    # pure one-speaker mix ≈ plain infer with that sid
    one = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    om, _, _ = net.apply(params, phone, jnp.array([8]), jnp.ones((1, 8), jnp.int32),
                         jnp.full((1, 8), 150.0), one, method=net.infer_mix,
                         rngs={"noise": jax.random.PRNGKey(2)})
    oi, _, _ = net.apply(params, phone, jnp.array([8]), jnp.ones((1, 8), jnp.int32),
                         jnp.full((1, 8), 150.0), jnp.array([0]), method=net.infer,
                         rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(om), np.asarray(oi), atol=1e-4)


def test_stablehlo_export_roundtrip(rng):
    from rvc_tpu.compat.export import export_infer, load_exported
    from rvc_tpu.models.synthesizer import Synthesizer

    net = Synthesizer(**TINY)
    params = _mk_params(net, 0)
    blob = export_infer(net, params, 24, max_frames=8)
    fn = load_exported(blob)
    out = fn(jnp.zeros((1, 8, 24)), jnp.array([8], jnp.int32),
             jnp.ones((1, 8), jnp.int32), jnp.full((1, 8), 150.0),
             jnp.array([0], jnp.int32), jnp.zeros((2,), jnp.uint32))
    assert np.asarray(out).shape == (1, 8 * 160)


def test_stablehlo_export_spk_mix(rng):
    """Speaker-mix export (reference models_onnx.py SynthesizerTrnMsNSFsidM
    counterpart): the serialized graph takes a (B, n_spk) weight map."""
    from rvc_tpu.compat.export import export_infer_mix, load_exported
    from rvc_tpu.models.synthesizer import Synthesizer

    net = Synthesizer(**TINY)
    params = _mk_params(net, 0)
    blob = export_infer_mix(net, params, 24, max_frames=8)
    fn = load_exported(blob)
    mix = jnp.asarray([[0.25, 0.25, 0.25, 0.25]], jnp.float32)
    out = fn(jnp.zeros((1, 8, 24)), jnp.array([8], jnp.int32),
             jnp.ones((1, 8), jnp.int32), jnp.full((1, 8), 150.0),
             mix, jnp.zeros((2,), jnp.uint32))
    assert np.asarray(out).shape == (1, 8 * 160)
    assert np.isfinite(np.asarray(out)).all()


def test_audio_processor(rng):
    from rvc_tpu.io.audio import AudioProcessor

    x = (0.2 * np.sin(2 * np.pi * 440 * np.arange(44100) / 44100)).astype(np.float32)
    x[1000] = 5.0
    out, sr = AudioProcessor()((x, 44100))
    assert abs(out[1000]) < 1.0  # click repaired
    assert sr == 44100
    assert str(AudioProcessor()) == str(AudioProcessor())
    out2, _ = AudioProcessor(fill_method="interpolation")((x, 44100))
    assert abs(out2[1000]) < 1.0


def test_onnx_initializer_parser(tmp_path, rng):
    """Round-trip a synthetic ONNX protobuf through the raw-wire parser."""
    import struct

    from rvc_tpu.compat.onnx_import import read_onnx_initializers

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def field(num, wire, payload):
        key = varint((num << 3) | wire)
        if wire == 2:
            return key + varint(len(payload)) + payload
        return key + payload

    arr = rng.standard_normal((2, 3)).astype(np.float32)
    tensor = (
        field(1, 0, varint(2)) + field(1, 0, varint(3))  # dims
        + field(2, 0, varint(1))  # float32
        + field(8, 2, b"w1")  # name
        + field(9, 2, arr.tobytes())  # raw_data
    )
    graph = field(5, 2, tensor)
    model = field(7, 2, graph)
    p = tmp_path / "m.onnx"
    p.write_bytes(model)
    out = read_onnx_initializers(str(p))
    assert "w1" in out
    np.testing.assert_array_equal(out["w1"], arr)


def test_parity_harness(rng, tmp_path):
    from rvc_tpu.bench.parity import compare_wavs, mel_distance_db
    from rvc_tpu.io.audio import save_input_audio

    t = np.arange(16000) / 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    assert mel_distance_db(x, x, 16000) < 1e-6
    y = x * 0.5  # pure gain → scale-aligned → ~0 distance
    assert mel_distance_db(x, y, 16000) < 1e-4
    z = (0.5 * np.sin(2 * np.pi * 550 * t)).astype(np.float32)
    assert mel_distance_db(x, z, 16000) > 1.0
    a, b = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    save_input_audio(a, (x, 16000))
    save_input_audio(b, (x, 16000))
    out = compare_wavs(a, b)
    assert out["mel_distance_db"] < 0.01
    assert out["sdr_db"] > 40


def test_torch_adam_state_import():
    """Round-trip torch Adam moments into an optax.adamw state."""
    import optax
    import torch

    from rvc_tpu.compat.optimizer_import import torch_adam_to_optax

    # a tiny torch "model" with the same names our tree uses
    tm = torch.nn.Module()
    tm.lin = torch.nn.Linear(4, 3)
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3)
    loss = tm.lin(torch.randn(2, 4)).sum()
    loss.backward()
    opt.step()
    ckpt = {"model": tm.state_dict(), "optimizer": opt.state_dict(),
            "iteration": 7}

    params = {"params": {"lin": {
        "weight": np.zeros((3, 4), np.float32),
        "bias": np.zeros((3,), np.float32),
    }}}
    tx = optax.adamw(1e-3)
    state = tx.init(params["params"])
    new_state, it = torch_adam_to_optax(ckpt, params, state)
    assert it == 7
    adam = [p for p in new_state if hasattr(p, "mu")][0]
    mu_w = np.asarray(adam.mu["lin"]["weight"])
    ref = tm.state_dict()["lin.weight"]
    torch_mu = opt.state_dict()["state"][0]["exp_avg"].numpy()
    np.testing.assert_allclose(mu_w, torch_mu, atol=1e-7)
    assert int(adam.count) == 1


def _onnx_writer_helpers():
    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def field(num, wire, payload):
        key = varint((num << 3) | wire)
        if wire == 2:
            return key + varint(len(payload)) + payload
        return key + payload

    def tensor(name, arr):
        buf = b"".join(field(1, 0, varint(d)) for d in arr.shape)
        buf += field(2, 0, varint(1))  # float32
        buf += field(8, 2, name.encode())
        buf += field(9, 2, np.ascontiguousarray(arr, np.float32).tobytes())
        return field(5, 2, buf)

    def node(op, inputs, outputs):
        buf = b"".join(field(1, 2, i.encode()) for i in inputs)
        buf += b"".join(field(2, 2, o.encode()) for o in outputs)
        buf += field(4, 2, op.encode())
        return field(1, 2, buf)

    return varint, field, tensor, node


def _flat_params(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out.extend(_flat_params(v, prefix + (k,)))
        else:
            out.append((prefix + (k,), np.asarray(v)))
    return out


@pytest.mark.heavy
def test_convtdf_onnx_auto_mapper(tmp_path, rng):
    """Both ONNX→ConvTDFNetTrim strategies: torch-named initializers and
    anonymized names via structural graph walking."""
    import re as _re

    import jax
    import jax.numpy as jnp
    import pytest

    from rvc_tpu.compat.onnx_import import convtdf_params_from_onnx
    from rvc_tpu.models.mdx_net import ConvTDFNetTrim

    model = ConvTDFNetTrim(num_blocks=5, l=1, g=4, bn=2, dim_f=16,
                           norm="GroupNorm2", act="relu")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 16, 4), jnp.float32))
    leaves = _flat_params(params["params"])
    _, field, tensor, node = _onnx_writer_helpers()

    # -- name-based: torch-style initializer names -------------------------
    def torch_name(path):
        def inv(p):
            return _re.sub(r"(?<=\d)_", ".", _re.sub(r"_(?=\d)", ".", p))

        return ".".join(inv(p) for p in path)

    graph = b"".join(tensor(torch_name(p), a) for p, a in leaves)
    f1 = tmp_path / "named.onnx"
    f1.write_bytes(field(7, 2, graph))
    got = convtdf_params_from_onnx(str(f1))
    for p, a in leaves:
        node_ = got["params"]
        for k in p:
            node_ = node_[k]
        np.testing.assert_array_equal(node_, a)

    # -- structural: anonymized names, mapped by graph walk ----------------
    # nodes must appear in trace (forward) order — spell it out for the
    # tiny config (n=2 scales, l=1 block, GroupNorm) independently of the
    # mapper's own order generator
    def trace_order():
        def dense(pre):
            yield (pre, "blocks_0_shortcut", "weight")
            for sub in ("tfc1_0", "tfc1_2", "tdf_0", "tdf_2", "tdf_3",
                        "tdf_5", "tfc2_0", "tfc2_2"):
                if sub.endswith(("_0", "_3")):
                    yield (pre, f"blocks_0_{sub}", "weight")
                    yield (pre, f"blocks_0_{sub}", "bias")
                else:
                    yield (pre, f"blocks_0_{sub}", "weight")

        yield ("first_conv", "weight")
        for i in range(2):
            yield from dense(f"ds_dense_{i}")
            yield (f"ds_{i}", "weight")
        yield from dense("mid_dense")
        for i in range(2):
            yield (f"us_{i}", "weight")
            yield from dense(f"us_dense_{i}")
        yield ("final_conv", "weight")

    by_path = {p: a for p, a in leaves}
    leaves = [(p, by_path[p]) for p in trace_order()]
    assert len(leaves) == len(by_path)

    inits = []
    nodes = []
    for i, (p, a) in enumerate(leaves):
        name = f"onnx::W_{i}"
        leaf = p[-1]
        if a.ndim == 4:
            op = "ConvTranspose" if _re.fullmatch(r"us_\d+", p[-2]) else "Conv"
            inits.append(tensor(name, a))
            nodes.append(node(op, [f"x{i}", name], [f"x{i+1}"]))
        elif a.ndim == 2:
            inits.append(tensor(name, a.T))  # ONNX MatMul stores (in, out)
            nodes.append(node("MatMul", [f"x{i}", name], [f"x{i+1}"]))
        elif leaf == "weight":
            inits.append(tensor(name, a))
            nodes.append(node("Mul", [f"x{i}", name], [f"x{i+1}"]))
        else:
            inits.append(tensor(name, a))
            nodes.append(node("Add", [f"x{i}", name], [f"x{i+1}"]))
    f2 = tmp_path / "anon.onnx"
    f2.write_bytes(field(7, 2, b"".join(nodes + inits)))
    got2 = convtdf_params_from_onnx(str(f2), model=model)
    for p, a in leaves:
        node_ = got2["params"]
        for k in p:
            node_ = node_[k]
        np.testing.assert_array_equal(node_, a)

    # anonymized without a model → clear error
    with pytest.raises(ValueError, match="structural"):
        convtdf_params_from_onnx(str(f2))

    # corrupt one conv shape → loud shape error
    bad = [(p, (a[:1] if a.ndim == 4 else a)) for p, a in leaves]
    inits_b, nodes_b = [], []
    for i, (p, a) in enumerate(bad):
        name = f"onnx::W_{i}"
        if a.ndim == 4:
            op = "ConvTranspose" if _re.fullmatch(r"us_\d+", p[-2]) else "Conv"
            inits_b.append(tensor(name, a))
            nodes_b.append(node(op, [f"x{i}", name], [f"x{i+1}"]))
        elif a.ndim == 2:
            inits_b.append(tensor(name, a.T))
            nodes_b.append(node("MatMul", [f"x{i}", name], [f"x{i+1}"]))
        elif p[-1] == "weight":
            inits_b.append(tensor(name, a))
            nodes_b.append(node("Mul", [f"x{i}", name], [f"x{i+1}"]))
        else:
            inits_b.append(tensor(name, a))
            nodes_b.append(node("Add", [f"x{i}", name], [f"x{i+1}"]))
    f3 = tmp_path / "bad.onnx"
    f3.write_bytes(field(7, 2, b"".join(nodes_b + inits_b)))
    with pytest.raises(ValueError, match="shape"):
        convtdf_params_from_onnx(str(f3), model=model)
