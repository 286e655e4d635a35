"""Karafan ensemble separation recipe (reference lib/karafan/inference.py:275-523).

The "magic recipe" as a declarative pipeline over any extractors that
expose ``demix(mix) -> stem``:

  1. music pre-extraction (ensemble-max over the music models),
  2. vocals extraction on (mix − music) (ensemble-max),
  3. music-bleed filtering of vocals,
  4. high/low-pass cleanup of vocals,
  5. music = mix − vocals,
  6. vocal-bleed (+ music re-removal) filtering of music,
  7. optional infra-bass and silence gating.

BigShifts averaging (demix_full, :789-835) is provided as a wrapper that
runs the extractor over time-rolled copies of the mix and averages — on
TPU the shifted copies batch together if the extractor supports it.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import numpy as np

from ..io.audio import remix_audio
from ..ops import karafan_utils as KU


Extractor = Callable[[np.ndarray], np.ndarray]  # (2, T) mix -> (2, T) stem


def _to_stereo_44k(audio: np.ndarray, sr: int) -> np.ndarray:
    """Resample to 44.1k preserving channels (remix_audio always downmixes)."""
    from scipy import signal as _ss
    import math

    audio = np.atleast_2d(np.asarray(audio, np.float32))
    if audio.shape[0] == 1:
        audio = np.vstack([audio, audio])
    if sr != 44100:
        g = math.gcd(sr, 44100)
        audio = _ss.resample_poly(audio, 44100 // g, sr // g, axis=-1).astype(np.float32)
    return audio


def bigshifts_demix(mix: np.ndarray, extractor: Extractor, bigshifts: int,
                    sr: int = 44100) -> np.ndarray:
    """Time-shift ensembling (reference demix_full)."""
    mix_length = mix.shape[-1] // sr
    bigshifts = max(1, min(bigshifts, max(mix_length - 1, 1)))
    demix_seconds = bigshifts
    while bigshifts * demix_seconds > mix_length and demix_seconds > 1:
        demix_seconds -= 1
    results = []
    for k in range(bigshifts):
        shift = int(k * demix_seconds * sr)
        shifted = np.roll(mix, shift, axis=-1)
        out = extractor(shifted)
        results.append(np.roll(out, -shift, axis=-1))
    n = min(r.shape[-1] for r in results)
    return np.mean([r[..., :n] for r in results], axis=0)


@dataclass
class KarafanConfig:
    normalize_db: float = -1.0
    high_pass: float = 80.0
    low_pass: float = 16000.0
    infra_bass: bool = False
    silent_db: float = 0.0  # <0 enables the silence gate
    bigshifts: int = 1
    denoise: bool = True


@dataclass
class KarafanPipeline:
    """models: dict of stage name → list of extractors."""

    music: Sequence[Extractor] = ()
    vocal: Sequence[Extractor] = ()
    bleed_music: Sequence[Extractor] = ()
    bleed_vocal: Sequence[Extractor] = ()
    remove_music: Sequence[Extractor] = ()
    config: KarafanConfig = field(default_factory=KarafanConfig)

    def _ensemble(self, extractors: Sequence[Extractor], mix: np.ndarray) -> np.ndarray | None:
        if not extractors:
            return None
        outs = []
        for ex in extractors:
            if self.config.bigshifts > 1:
                outs.append(bigshifts_demix(mix, ex, self.config.bigshifts))
            else:
                outs.append(ex(mix))
        return outs[0] if len(outs) == 1 else KU.make_ensemble("Max", outs)

    def separate(self, audio: np.ndarray, sr: int) -> dict:
        cfg = self.config
        mix = _to_stereo_44k(audio, sr)
        normalized = KU.normalize(mix, cfg.normalize_db) if cfg.normalize_db < 0 else mix

        # 1-2: music pre-pass then vocals on the residual
        music_ens = self._ensemble(self.music, normalized)
        vocal_src = normalized if music_ens is None else normalized - music_ens
        vocal_ens = self._ensemble(self.vocal, vocal_src)
        if vocal_ens is None:
            raise ValueError("karafan pipeline needs at least one vocal extractor")

        # 3: remove music bleed from vocals
        bleed = self._ensemble(self.bleed_music, vocal_ens)
        vocal_final = vocal_ens if bleed is None else vocal_ens - bleed

        # 4: band-pass cleanup
        if cfg.high_pass > 0:
            vocal_final = KU.pass_filter("highpass", cfg.high_pass, vocal_final, 44100, 16)
        if cfg.low_pass < 22000:
            order = 16 if cfg.low_pass > 17000 else 8
            vocal_final = KU.pass_filter("lowpass", cfg.low_pass, vocal_final, 44100, order)

        # 5-6: music residual, vocal-bleed removal
        n = min(normalized.shape[-1], vocal_final.shape[-1])
        music_sub = normalized[..., :n] - vocal_final[..., :n]
        vbleed = self._ensemble(self.bleed_vocal, music_sub)
        if vbleed is not None:
            mrem = self._ensemble(self.remove_music, vbleed)
            if mrem is not None:
                vbleed = vbleed - mrem[..., : vbleed.shape[-1]]
            music_final = music_sub - vbleed[..., : music_sub.shape[-1]]
        else:
            music_final = music_sub

        # 7: final polish
        if cfg.infra_bass:
            vocal_final = KU.pass_filter("highpass", 18, vocal_final, 44100, 100)
            music_final = KU.pass_filter("highpass", 18, music_final, 44100, 100)
        if cfg.silent_db < 0:
            vocal_final = KU.silent(vocal_final, 44100, cfg.silent_db)

        return {
            "sr": 44100,
            "vocals": remix_audio((vocal_final, 44100), to_int16=True),
            "instrumentals": remix_audio((music_final, 44100), to_int16=True),
            "input_audio": (mix, 44100),
        }
