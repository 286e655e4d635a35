"""Device-side DSP ops: STFT/iSTFT, mel, resampling, filters, envelopes.

Everything here is pure jnp (jit-able, differentiable where it matters) and
designed for the MXU: spectral transforms are expressed as windowed-DFT
matmuls rather than FFT butterflies, which is the fastest formulation for
the frame sizes used by RVC (n_fft ≤ 2048) on TPU.

Import the submodules directly (``rvc_tpu.ops.stft`` etc.); function names
intentionally are not re-exported at package level to avoid shadowing the
submodules.
"""

from . import stft, mel, resample, filters, slicer  # noqa: F401
