"""rvc_tpu — a TPU-native voice-conversion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
SayanoAI/Comfy-RVC (reference mounted at /root/reference): vocal
separation, pitch extraction, HuBERT content encoding, retrieval-blended
feature conversion, and a VITS-style NSF-HiFiGAN synthesizer for both
inference and GAN training — re-architected so the conversion hot path runs
as batched, device-resident XLA dispatches.

Design principles (TPU-first, not a port):
  * channels-last (B, T, C) tensor layout everywhere (lanes = channels),
  * STFT/iSTFT/mel as windowed-DFT matmuls on the MXU,
  * audio chunks become a batch dimension (one dispatch per bucket instead
    of a per-chunk host loop, cf. reference vc_infer_pipeline.py:167-180),
  * retrieval is an on-device top-k matmul (replaces faiss IVF search at
    reference vc_infer_pipeline.py:60-75),
  * static shapes + bucketing; no data-dependent python control flow under jit,
  * parallelism via jax.sharding.Mesh + NamedSharding (DP over ICI),
    replacing the reference's mp.spawn + gloo DDP (training_cli.py:104-121).
"""

__version__ = "0.1.0"
