"""Host-side audio I/O and waveform utilities.

The one place in the framework that touches files/containers; everything
downstream of these functions is device-resident. Covers the reference's
lib/audio.py surface:

  * load/save (reference lib/audio.py:126-186) — WAV natively via scipy
    (no external deps); other containers via the ffmpeg CLI when present.
  * remix (resample/downmix/normalize/int16, reference :144-163).
  * compressed base64 string codec for inter-node transport (:212-255).
  * pad/merge (:257-272), autotune to a 72-note table (:274-300),
    HTK hz→mel (:302-304).

Resampling on the host path uses scipy polyphase (identical math to the
device resampler in ops/resample.py).
"""
from __future__ import annotations

import base64
import io as _io
import math
import os
import shutil
import subprocess
import zlib

import numpy as np
from scipy import signal as _ss
from scipy.io import wavfile as _wavfile

from ..utils import get_merge_func

MAX_INT16 = 32768
SUPPORTED_AUDIO = ["mp3", "flac", "wav"]
OUTPUT_CHANNELS = ["mono", "stereo"]

# Equal-tempered C2..B7 note table used for autotune (reference lib/audio.py:17-30).
AUTOTUNE_NOTES = 440.0 * 2.0 ** ((np.arange(72) - 33) / 12.0)


def hz_to_mel(hz):
    """HTK mel (reference lib/audio.py:302-304)."""
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def _resample_host(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return audio
    g = math.gcd(int(orig_sr), int(target_sr))
    return _ss.resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def _read_wav(path: str) -> tuple[np.ndarray, int]:
    sr, data = _wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:  # (frames, channels) -> (channels, frames)
        data = data.T
    return data, int(sr)


def _write_wav(path_or_buf, audio: np.ndarray, sr: int) -> None:
    if audio.ndim > 1 and audio.shape[0] < audio.shape[1]:
        audio = audio.T  # wavfile expects frames x channels
    if audio.dtype not in (np.int16, np.float32):
        audio = audio.astype(np.float32)
    _wavfile.write(path_or_buf, sr, audio)


def _ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def _load_via_ffmpeg(path: str, sr: int) -> tuple[np.ndarray, int]:
    cmd = [
        "ffmpeg", "-nostdin", "-threads", "0", "-i", path,
        "-f", "f32le", "-acodec", "pcm_f32le", "-ac", "1", "-ar", str(sr), "-",
    ]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(out, np.float32).copy(), sr


def load_input_audio(path: str, sr: int | None = None, **kwargs) -> tuple[np.ndarray, int]:
    """Decode any supported container to float32 PCM (reference lib/audio.py:126-169)."""
    path = path.strip().strip('"').strip()
    if path.lower().endswith(".wav") or not _ffmpeg_available():
        audio, file_sr = _read_wav(path)
        if sr is not None and file_sr != sr:
            audio = _resample_host(audio, file_sr, sr)
            file_sr = sr
        return remix_audio((audio, file_sr), **kwargs)
    audio, file_sr = _load_via_ffmpeg(path, sr or 44100)
    return remix_audio((audio, file_sr), **kwargs)


def remix_audio(
    input_audio,
    target_sr: int | None = None,
    norm: bool = False,
    to_int16: bool = False,
    resample: bool = False,
    axis: int = 0,
    merge_type: str | None = None,
    max_volume: float = 0.95,
    **kwargs,
) -> tuple[np.ndarray, int]:
    """Resample / downmix / normalize (reference lib/audio.py:144-163)."""
    audio = np.asarray(input_audio[0], dtype=np.float32)
    in_sr = int(input_audio[1])
    if target_sr is None:
        target_sr = in_sr
    if resample or in_sr != target_sr:
        audio = _resample_host(audio, in_sr, target_sr)
    if audio.ndim > 1:
        audio = get_merge_func(merge_type)(audio, axis=axis)
    if norm:
        peak = np.max(np.abs(audio)) or 1.0
        audio = audio / peak
    audio_max = np.abs(audio).max() / max_volume
    if audio_max > 1:
        audio = audio / audio_max
    if to_int16:
        audio = np.clip(audio * MAX_INT16, 1 - MAX_INT16, MAX_INT16 - 1).astype(np.int16)
    return audio, target_sr


def save_input_audio(
    fname: str,
    input_audio,
    sr: int | None = None,
    to_int16: bool = False,
    to_stereo: bool = False,
    max_volume: float = 0.99,
) -> str:
    """Save float or int16 audio to WAV (reference lib/audio.py:171-186)."""
    d = os.path.dirname(fname)
    if d:
        os.makedirs(d, exist_ok=True)
    audio = np.asarray(input_audio[0], dtype=np.float32)
    audio_max = np.abs(audio).max() / max_volume
    if audio_max > 1:
        audio = audio / audio_max
    if to_int16:
        audio = np.clip(audio * MAX_INT16, 1 - MAX_INT16, MAX_INT16 - 1)
    if to_stereo and audio.ndim < 2:
        audio = np.stack([audio, audio], axis=-1)
    out = audio.astype(np.int16 if np.abs(audio).max() > 1 else np.float32)
    _write_wav(fname, out, sr if sr else int(input_audio[1]))
    return f"File saved to {fname}"


def audio_to_bytes(audio, sr: int, to_int16: bool = False) -> bytes:
    """WAV-container bytes (reference lib/audio.py:188-204)."""
    audio = np.asarray(audio, dtype=np.float32)
    if to_int16:
        audio_max = np.abs(audio).max() / 0.99
        if audio_max > 1:
            audio = audio / audio_max
        audio = np.clip(audio * MAX_INT16, -MAX_INT16 + 1, MAX_INT16 - 1).astype(np.int16)
    buf = _io.BytesIO()
    _write_wav(buf, audio, sr)
    buf.seek(0)
    return buf.read()


def bytes_to_audio(data: bytes) -> tuple[np.ndarray, int]:
    sr, audio = _wavfile.read(_io.BytesIO(data))
    if audio.dtype == np.int16:
        audio = audio.astype(np.float32) / 32768.0
    if audio.ndim > 1 and audio.shape[1] < audio.shape[0]:
        audio = audio.T
    return audio, int(sr)


def audio2str(audio: np.ndarray, sr: int) -> str:
    """Compressed base64 string transport codec (reference lib/audio.py:237-255)."""
    data = zlib.compress(np.ascontiguousarray(audio).tobytes())
    enc = base64.b64encode(data).decode()
    return ":".join([audio.dtype.name, enc, ",".join(map(str, audio.shape)), str(sr)])


def str2audio(s: str) -> tuple[np.ndarray, int]:
    dtype, data, shape, sr = s.split(":")
    arr = np.frombuffer(zlib.decompress(base64.b64decode(data)), dtype=dtype)
    return arr.reshape(tuple(map(int, shape.split(",")))).copy(), int(sr)


def pad_audio(*audios, axis: int = 0) -> np.ndarray:
    """Zero-pad to equal length and stack (reference lib/audio.py:257-262)."""
    arrs = [np.asarray(a) for a in audios if a is not None]
    maxlen = max((a.shape[-1] for a in arrs), default=0)
    fixed = [
        np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, maxlen - a.shape[-1])]) for a in arrs
    ]
    return np.stack(fixed, axis=axis)


def merge_audio(audio1, audio2, sr: int = 40000, **kwargs):
    """Mix two clips at a common rate (reference lib/audio.py:264-272)."""
    if sr is None:
        sr = min(audio1[-1], audio2[-1])
    m1, _ = remix_audio(audio1, target_sr=sr, axis=0, **kwargs)
    m2, _ = remix_audio(audio2, target_sr=sr, axis=0, **kwargs)
    mixed = pad_audio(m1, m2, axis=0)
    return remix_audio((mixed, sr), axis=0, **kwargs)


def autotune_f0(f0: np.ndarray, threshold: float = 0.0) -> np.ndarray:
    """Snap f0 to the nearest note (vectorized; reference lib/audio.py:274-300)."""
    f0 = np.asarray(f0, dtype=np.float32)
    diff = np.abs(AUTOTUNE_NOTES[None, :] - f0[..., None])
    idx = np.argmin(diff, axis=-1)
    nearest = AUTOTUNE_NOTES[idx].astype(np.float32)
    keep = np.take_along_axis(diff, idx[..., None], axis=-1)[..., 0] < threshold
    return np.where(keep, f0, nearest)


class AudioProcessor:
    """Click/silence cleaner (reference lib/audio.py:33-113): optional RMS
    silence gate, dynamic click thresholding with median/interp repair, and
    peak normalization. Hash-stable __str__ for node caching."""

    def __init__(self, normalize=True, threshold_silence=True, dynamic_threshold=True,
                 sample_size=16000, multiplier=2.0, fill_method="median",
                 kernel_size=5, silence_threshold_db=-50, normalize_threshold_db=-1):
        self.normalize = normalize
        self.threshold_silence = threshold_silence
        self.dynamic_threshold = dynamic_threshold
        self.sample_size = sample_size
        self.multiplier = multiplier
        self.fill_method = fill_method
        self.kernel_size = kernel_size
        self.silence_threshold_db = silence_threshold_db
        self.normalize_threshold_db = normalize_threshold_db

    def __str__(self) -> str:
        from ..utils import get_hash

        values = [self.normalize, self.threshold_silence, self.dynamic_threshold]
        if self.normalize:
            values.append(self.normalize_threshold_db)
        if self.threshold_silence:
            values.append(self.silence_threshold_db)
        if self.dynamic_threshold:
            values.extend([self.sample_size, self.multiplier, self.fill_method,
                           self.kernel_size])
        return get_hash(*values)

    def __call__(self, audio) -> tuple[np.ndarray, int]:
        samples, sr = audio if isinstance(audio, tuple) else (audio, 44100)
        samples = np.asarray(samples, np.float32)
        if self.threshold_silence:
            from ..ops.karafan_utils import silent

            samples = np.squeeze(
                silent(np.atleast_2d(samples), sr, self.silence_threshold_db), 0)
        if self.dynamic_threshold:
            samples = self.dynamic_thresholding(
                samples, self.multiplier, self.sample_size, self.fill_method,
                self.kernel_size)
        if self.normalize:
            from ..ops.karafan_utils import normalize as _norm

            samples = _norm(samples, self.normalize_threshold_db)
        return samples, sr

    @staticmethod
    def dynamic_thresholding(samples, multiplier=2.0, sample_size=16000,
                             method="median", kernel_size=5):
        from scipy.ndimage import uniform_filter1d

        local_rms = np.sqrt(uniform_filter1d(np.square(samples), size=int(sample_size)))
        clicks = np.abs(samples) > multiplier * local_rms
        return AudioProcessor.replace_clicks(samples, clicks, method, kernel_size)

    @staticmethod
    def replace_clicks(samples, clicks, method="median", kernel_size=5):
        from scipy.ndimage import median_filter
        from scipy.interpolate import interp1d

        cleaned = samples.copy()
        if method == "median":
            cleaned[clicks] = median_filter(samples, size=kernel_size)[clicks]
        elif method == "interpolation":
            good = np.where(~clicks)[0]
            bad = np.where(clicks)[0]
            if len(good) > 1 and len(bad):
                f = interp1d(good, cleaned[good], kind="linear", bounds_error=False,
                             fill_value="extrapolate")
                cleaned[bad] = f(bad)
        else:
            raise ValueError("Method must be 'median' or 'interpolation'")
        return cleaned
