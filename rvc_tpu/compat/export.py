"""Portable serialized inference graphs — the TPU-native "ONNX export".

The reference exports synthesizers to ONNX for onnxruntime
(lib/infer_pack/models_onnx.py); the JAX-native equivalent is
jax.export: the jitted conversion function serializes to StableHLO,
loadable by any JAX/XLA runtime (CPU/GPU/TPU) without Python model code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def export_infer(synth, params, feature_dim: int, max_frames: int = 2048,
                 batch: int = 1):
    """Serialize ``Synthesizer.infer`` to StableHLO bytes."""
    from jax import export as jexport

    def fn(phone, lengths, pitch, nsff0, sid, key):
        o, _, _ = synth.apply(params, phone, lengths, pitch, nsff0, sid,
                              method=synth.infer, rngs={"noise": key})
        return o[..., 0]

    args = (
        jax.ShapeDtypeStruct((batch, max_frames, feature_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch, max_frames), jnp.int32),
        jax.ShapeDtypeStruct((batch, max_frames), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    exported = jexport.export(jax.jit(fn))(*args)
    return exported.serialize()


def export_infer_mix(synth, params, feature_dim: int, max_frames: int = 2048,
                     batch: int = 1):
    """Serialize ``Synthesizer.infer_mix`` to StableHLO bytes — the
    counterpart of the reference speaker-mix ONNX export
    (models_onnx.py:530-628 SynthesizerTrnMsNSFsidM + construct_spkmixmap):
    the exported graph takes a (B, n_spk) speaker weight map instead of a
    speaker id and blends the embedding table on device."""
    from jax import export as jexport

    def fn(phone, lengths, pitch, nsff0, spk_mix, key):
        o, _, _ = synth.apply(params, phone, lengths, pitch, nsff0, spk_mix,
                              method=synth.infer_mix, rngs={"noise": key})
        return o[..., 0]

    args = (
        jax.ShapeDtypeStruct((batch, max_frames, feature_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch, max_frames), jnp.int32),
        jax.ShapeDtypeStruct((batch, max_frames), jnp.float32),
        jax.ShapeDtypeStruct((batch, synth.spk_embed_dim), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    exported = jexport.export(jax.jit(fn))(*args)
    return exported.serialize()


def load_exported(blob: bytes):
    """Deserialize an exported graph; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return exported.call
