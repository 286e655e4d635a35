"""Whisper encoder-decoder in Flax (STT + lip-sync feature frontend).

The reference vendors the full OpenAI Whisper (lib/musetalk/whisper/, 2550
LoC, torch) and uses (a) ``transcribe`` for the STT node (custom_nodes/
stt.py:224) and (b) per-segment encoder embeddings for MuseTalk lip-sync
conditioning (audio2feature.py). This is a from-scratch Flax
implementation of the same architecture: log-mel frontend → conv stem +
sinusoidal positions → pre-norm transformer encoder; token/position
embeddings → causal self-attention + cross-attention decoder with a
static KV cache for greedy decoding.

Param names mirror the OpenAI checkpoint state_dict
(encoder.blocks.N.attn.query …) so ``compat.torch_import.build_tree``
loads the official .pt weights directly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.mel import _mel_filterbank_np
from ..ops.stft import stft as _stft
from .layers import Linear

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


@dataclass(frozen=True)
class WhisperDims:
    """Model dimensions (OpenAI naming). Defaults = tiny."""

    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4


# language codes in token order: token id = SOT + 1 + index (the public
# whisper tokenizer LANGUAGES table; v3 appends "yue")
LANGUAGE_CODES = (
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su", "yue",
)


WHISPER_SIZES = {
    "tiny": WhisperDims(),
    "base": WhisperDims(n_audio_state=512, n_audio_head=8, n_audio_layer=6,
                        n_text_state=512, n_text_head=8, n_text_layer=6),
    "small": WhisperDims(n_audio_state=768, n_audio_head=12, n_audio_layer=12,
                         n_text_state=768, n_text_head=12, n_text_layer=12),
    "medium": WhisperDims(n_audio_state=1024, n_audio_head=16, n_audio_layer=24,
                          n_text_state=1024, n_text_head=16, n_text_layer=24),
}


def log_mel_spectrogram(audio: jax.Array) -> jax.Array:
    """(B, T) 16 kHz -> (B, frames, 80) normalized log10-mel (whisper audio.py
    semantics: reflect-pad center STFT, power, slaney mel, log10 clamp,
    dynamic-range clip to max-8, (x+4)/4)."""
    real, imag = _stft(audio, N_FFT, HOP_LENGTH, N_FFT, center=True)
    # whisper drops the final frame
    power = (real * real + imag * imag)[:, :-1, :]
    fb = jnp.asarray(_mel_filterbank_np(SAMPLE_RATE, N_FFT, N_MELS, 0.0, None),
                     power.dtype)
    mel = jnp.matmul(power, fb, precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def _sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class WhisperLN(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.dim,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.dim,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        return (((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * w + b).astype(self.dtype)


class WhisperAttention(nn.Module):
    """MHA with OpenAI naming (query/key/value/out; key has no bias)."""

    n_state: int
    n_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, xa=None, mask=None, kv_cache=None):
        q = Linear(self.n_state, self.n_state, dtype=self.dtype, name="query")(x)
        src = xa if xa is not None else x
        k = Linear(self.n_state, self.n_state, use_bias=False, dtype=self.dtype,
                   name="key")(src)
        v = Linear(self.n_state, self.n_state, dtype=self.dtype, name="value")(src)
        new_cache = None
        if kv_cache is not None:
            # append at position kv_cache["pos"] (self-attn decode step)
            ck, cv, pos = kv_cache
            ck = jax.lax.dynamic_update_slice(ck, k, (0, pos, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, pos, 0))
            k, v = ck, cv
            new_cache = (ck, cv)
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        H, d = self.n_head, self.n_state // self.n_head
        scale = (self.n_state // self.n_head) ** -0.25
        qh = (q * scale).reshape(B, Tq, H, d).transpose(0, 2, 1, 3)
        kh = (k * scale).reshape(B, Tk, H, d).transpose(0, 2, 1, 3)
        vh = v.reshape(B, Tk, H, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh)
        if mask is not None:
            scores = scores + mask
        p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        o = jnp.einsum("bhts,bhsd->bhtd", p, vh).transpose(0, 2, 1, 3).reshape(B, Tq, -1)
        return Linear(self.n_state, self.n_state, dtype=self.dtype, name="out")(o), new_cache


class ResidualBlock(nn.Module):
    n_state: int
    n_head: int
    cross: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, xa=None, mask=None, self_cache=None):
        h = WhisperLN(self.n_state, dtype=self.dtype, name="attn_ln")(x)
        a, new_cache = WhisperAttention(self.n_state, self.n_head, dtype=self.dtype,
                                        name="attn")(h, mask=mask, kv_cache=self_cache)
        x = x + a
        if self.cross:
            h = WhisperLN(self.n_state, dtype=self.dtype, name="cross_attn_ln")(x)
            a, _ = WhisperAttention(self.n_state, self.n_head, dtype=self.dtype,
                                    name="cross_attn")(h, xa=xa)
            x = x + a
        h = WhisperLN(self.n_state, dtype=self.dtype, name="mlp_ln")(x)
        h = Linear(self.n_state, self.n_state * 4, dtype=self.dtype, name="mlp_0")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = Linear(self.n_state * 4, self.n_state, dtype=self.dtype, name="mlp_2")(h)
        return x + h, new_cache


class AudioEncoder(nn.Module):
    dims: WhisperDims
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, return_layers: bool = False):
        """mel: (B, frames, n_mels) -> (B, frames//2, n_state).

        return_layers: also return all block outputs (the reference's
        MuseTalk feature extraction uses per-layer encoder embeddings)."""
        from .layers import Conv1d

        d = self.dims
        x = Conv1d(d.n_mels, d.n_audio_state, 3, padding=1, dtype=self.dtype,
                   name="conv1")(mel)
        x = jax.nn.gelu(x, approximate=False)
        x = Conv1d(d.n_audio_state, d.n_audio_state, 3, stride=2, padding=1,
                   dtype=self.dtype, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        pos = jnp.asarray(_sinusoids(d.n_audio_ctx, d.n_audio_state), x.dtype)
        x = x + pos[: x.shape[1]]
        layers = []
        for i in range(d.n_audio_layer):
            x, _ = ResidualBlock(d.n_audio_state, d.n_audio_head, dtype=self.dtype,
                                 name=f"blocks_{i}")(x)
            layers.append(x)
        x = WhisperLN(d.n_audio_state, dtype=self.dtype, name="ln_post")(x)
        if return_layers:
            return x, jnp.stack(layers, axis=1)  # (B, layers, T, D)
        return x


class TextDecoder(nn.Module):
    dims: WhisperDims
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, audio_features, positions=None):
        """tokens: (B, T) int; audio_features: (B, S, D) -> logits (B, T, vocab)."""
        d = self.dims
        emb = self.param(
            "token_embedding_weight",
            lambda k, s: 0.02 * jax.random.normal(k, s, jnp.float32),
            (d.n_vocab, d.n_text_state),
        )
        pos_emb = self.param(
            "positional_embedding",
            lambda k, s: 0.02 * jax.random.normal(k, s, jnp.float32),
            (d.n_text_ctx, d.n_text_state),
        )
        T = tokens.shape[1]
        if positions is None:
            x = jnp.take(emb, tokens, axis=0) + pos_emb[:T]
        else:
            x = jnp.take(emb, tokens, axis=0) + pos_emb[positions]
        x = x.astype(self.dtype)
        mask = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)
        for i in range(d.n_text_layer):
            x, _ = ResidualBlock(d.n_text_state, d.n_text_head, cross=True,
                                 dtype=self.dtype, name=f"blocks_{i}")(
                x, xa=audio_features, mask=mask)
        x = WhisperLN(d.n_text_state, dtype=self.dtype, name="ln")(x)
        return jnp.matmul(x.astype(jnp.float32), emb.T)


class Whisper(nn.Module):
    dims: WhisperDims
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = AudioEncoder(self.dims, dtype=self.dtype)
        self.decoder = TextDecoder(self.dims, dtype=self.dtype)

    def embed_audio(self, mel, return_layers: bool = False):
        return self.encoder(mel, return_layers=return_layers)

    def logits(self, tokens, audio_features):
        return self.decoder(tokens, audio_features)

    def __call__(self, mel, tokens):
        return self.decoder(tokens, self.encoder(mel))


# ---------------------------------------------------------------------------
# Weight import (OpenAI .pt layout)
# ---------------------------------------------------------------------------

_WHISPER_RENAMES = [
    (r"\.mlp\.0\.", r".mlp_0."),
    (r"\.mlp\.2\.", r".mlp_2."),
    (r"decoder\.token_embedding\.weight", r"decoder.token_embedding_weight"),
]


def whisper_params_from_state_dict(state_dict) -> dict:
    from ..compat.torch_import import build_tree

    return {"params": build_tree(state_dict, renames=_WHISPER_RENAMES)}


def load_whisper(path: str):
    """Load an OpenAI whisper .pt → (params, WhisperDims)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dims = WhisperDims(**{k: v for k, v in ckpt["dims"].items()
                          if k in WhisperDims.__dataclass_fields__})
    return whisper_params_from_state_dict(ckpt["model_state_dict"]), dims


# ---------------------------------------------------------------------------
# Greedy transcription (host loop over a jitted full-context decoder)
# ---------------------------------------------------------------------------


def detect_language(params, dims: WhisperDims, mel: jax.Array,
                    dtype=jnp.float32) -> tuple[np.ndarray, np.ndarray]:
    """Language id from one decoder forward on the SOT token (reference
    musetalk whisper decoding.detect_language semantics): logits are
    restricted to the language-token range and softmaxed.

    Returns (language_token_ids (B,), probabilities (B,)). For the
    multilingual vocab the language tokens are 50259..50358 (sot+1 ..
    sot+100); pass the ids straight into greedy_decode's sot_sequence.
    """
    if dims.n_vocab < 51865:
        raise ValueError("English-only model has no language tokens")
    model = Whisper(dims, dtype=dtype)
    audio = model.apply(params, mel, method=Whisper.embed_audio)
    sot = 50258  # languages follow immediately (99, or 100 for v3)
    B = mel.shape[0]
    tokens = jnp.full((B, 1), sot, jnp.int32)
    logits = model.apply(params, tokens, audio, method=Whisper.logits)[:, 0]
    n_lang = 100 if dims.n_vocab == 51866 else 99
    lang_logits = logits[:, sot + 1 : sot + 1 + n_lang]
    probs = jax.nn.softmax(lang_logits, axis=-1)
    ids = jnp.argmax(probs, axis=-1)
    return (np.asarray(ids) + sot + 1,
            np.asarray(jnp.take_along_axis(probs, ids[:, None], 1)[:, 0]))


def decode_with_timestamps(params, dims: WhisperDims, mel: jax.Array,
                           language: str | None = None, max_len: int = 224,
                           dtype=jnp.float32) -> list[list[tuple]]:
    """Segment-level timestamps from the model's timestamp tokens (what
    the reference's HF pipeline produces with return_timestamps=True,
    custom_nodes/stt.py:162): decode WITHOUT the notimestamps token and
    parse ``<|t0|> text <|t1|>`` pairs at 0.02 s resolution.

    Returns per batch element a list of (start_s, end_s, [token ids]).
    """
    # multilingual layout: eot(50257), sot(50258), languages (99, or 100
    # for v3's 51866 vocab), translate, transcribe, startoflm, startofprev,
    # nospeech, notimestamps, then timestamp tokens every 0.02 s
    sot, eot = 50258, 50257
    n_lang = 100 if dims.n_vocab == 51866 else 99
    transcribe = sot + n_lang + 2
    ts_begin = sot + n_lang + 7
    toks = greedy_decode(params, dims, mel,
                         sot_sequence=(sot, sot + 1, transcribe),
                         eot=eot, max_len=max_len, dtype=dtype,
                         language=language)
    out = []
    for row in np.asarray(toks):
        segments = []
        start = None
        text: list[int] = []
        for t in row.tolist():
            if t == eot:
                break
            if t >= ts_begin:
                stamp = (t - ts_begin) * 0.02
                if start is None:
                    start = stamp
                else:
                    segments.append((start, stamp, text))
                    start, text = None, []
            elif t < eot:
                text.append(t)
        if start is not None and text:
            segments.append((start, start + 0.02 * len(text), text))
        out.append(segments)
    return out


def greedy_decode(params, dims: WhisperDims, mel: jax.Array,
                  sot_sequence: tuple[int, ...] = (50258, 50259, 50359, 50363),
                  eot: int = 50257, max_len: int = 128, dtype=jnp.float32,
                  language: str | None = None):
    """Greedy token decoding; returns (B, ≤max_len) token ids (without SOT).

    language="auto" replaces the language slot of sot_sequence with the
    detected language token (first batch element's detection)."""
    model = Whisper(dims, dtype=dtype)
    if language and len(sot_sequence) >= 2:
        if language == "auto":
            lang_ids, _ = detect_language(params, dims, mel, dtype=dtype)
            lang_tok = int(lang_ids[0])
        else:
            lang_tok = 50258 + 1 + LANGUAGE_CODES.index(language)
        sot_sequence = (sot_sequence[0], lang_tok, *sot_sequence[2:])
    audio = model.apply(params, mel, method=Whisper.embed_audio)
    B = mel.shape[0]
    # never decode past the text context window
    max_len = min(max_len, dims.n_text_ctx - len(sot_sequence))
    n_sot = len(sot_sequence)
    # fixed-size token buffer → ONE compile for the whole decode (the
    # causal mask makes positions ≥ step irrelevant to the step's logits;
    # a growing buffer would recompile at every step)
    L = n_sot + max_len
    buf = jnp.full((B, L), eot, jnp.int32)
    buf = buf.at[:, :n_sot].set(jnp.asarray(sot_sequence, jnp.int32)[None])

    @jax.jit
    def step_fn(p, t, a, pos):
        logits = model.apply(p, t, a, method=Whisper.logits)
        row = jax.lax.dynamic_slice_in_dim(logits, pos, 1, axis=1)[:, 0]
        return jnp.argmax(row, axis=-1).astype(jnp.int32)

    out = []
    done = np.zeros(B, bool)
    pos = n_sot
    for _ in range(max_len):
        nxt = np.asarray(step_fn(params, buf, audio, pos - 1))
        nxt = np.where(done, eot, nxt)
        done |= nxt == eot
        out.append(nxt)
        if done.all():
            break
        buf = buf.at[:, pos].set(jnp.asarray(nxt))
        pos += 1
    return np.stack(out, axis=1)


# ---------------------------------------------------------------------------
# Beam search + temperature fallback (reference vendored whisper
# decoding.py BeamSearchDecoder / transcribe.py fallback ladder)
# ---------------------------------------------------------------------------


def beam_decode(params, dims: WhisperDims, mel: jax.Array,
                beam_size: int = 5,
                sot_sequence: tuple[int, ...] = (50258, 50259, 50359, 50363),
                eot: int = 50257, max_len: int = 128, dtype=jnp.float32,
                language: str | None = None,
                length_penalty: float | None = None):
    """Beam-search decoding for ONE segment (B=1 semantics per beam group).

    TPU mapping of the reference BeamSearchDecoder (decoding.py): all
    ``beam_size`` hypotheses live in the batch dimension of a fixed-size
    token buffer, so each step is one batched decoder forward + one
    jnp.top_k over beam·vocab — no host-side per-beam bookkeeping inside
    the hot loop. Returns (tokens (≤max_len,), avg_logprob) of the best
    finished hypothesis (length-penalty-normalized like the reference's
    MaximumLikelihoodRanker; None penalty = divide by length).
    """
    model = Whisper(dims, dtype=dtype)
    if mel.ndim == 2:
        mel = mel[None]
    if language and len(sot_sequence) >= 2:
        if language == "auto":
            lang_ids, _ = detect_language(params, dims, mel, dtype=dtype)
            lang_tok = int(lang_ids[0])
        else:
            lang_tok = 50258 + 1 + LANGUAGE_CODES.index(language)
        sot_sequence = (sot_sequence[0], lang_tok, *sot_sequence[2:])
    audio = model.apply(params, mel, method=Whisper.embed_audio)
    audio = jnp.repeat(audio, beam_size, axis=0)  # (beam, Ta, D)

    n_sot = len(sot_sequence)
    max_len = min(max_len, dims.n_text_ctx - n_sot)
    L = n_sot + max_len
    buf = jnp.full((beam_size, L), eot, jnp.int32)
    buf = buf.at[:, :n_sot].set(jnp.asarray(sot_sequence, jnp.int32)[None])
    # beam 0 starts live; the rest at -inf so step 1 fans out from one root
    sum_lp = np.array([0.0] + [-1e30] * (beam_size - 1), np.float64)

    @jax.jit
    def step_fn(p, t, a, pos):
        logits = model.apply(p, t, a, method=Whisper.logits)
        row = jax.lax.dynamic_slice_in_dim(logits, pos, 1, axis=1)[:, 0]
        lp = jax.nn.log_softmax(row.astype(jnp.float32), axis=-1)
        # only the per-beam top-(k+1) can survive the reference's ranking
        # (decoding.py:312) — download (beam, k+1), not (beam, vocab)
        vals, idxs = jax.lax.top_k(lp, beam_size + 1)
        return vals, idxs

    @jax.jit
    def regather(t, src, tok, pos):
        return t[src].at[:, pos + 1].set(tok)

    finished: list[tuple[float, np.ndarray]] = []  # first-come, like ref
    max_candidates = beam_size  # patience=1.0
    prefixes = [np.zeros((0,), np.int32)] * beam_size
    pos = n_sot - 1
    for _ in range(max_len):
        vals, idxs = step_fn(params, buf, audio, pos)
        vals, idxs = np.asarray(vals, np.float64), np.asarray(idxs)
        # exact reference update (decoding.py:305-332): rank ALL beam·(k+1)
        # candidates, EOT ones retire to the finished pool, the best
        # beam_size non-EOT continue
        scores = (sum_lp[:, None] + vals).reshape(-1)
        order = np.argsort(-scores)
        new_src, new_tok, new_lp, new_pref = [], [], [], []
        for flat in order:
            b, j = divmod(int(flat), beam_size + 1)
            tok = int(idxs[b, j])
            if tok == eot:
                if len(finished) < max_candidates:
                    finished.append((float(scores[flat]), prefixes[b]))
            else:
                new_src.append(b)
                new_tok.append(tok)
                new_lp.append(float(scores[flat]))
                new_pref.append(np.append(prefixes[b], tok))
                if len(new_src) == beam_size:
                    break
        buf = regather(buf, jnp.asarray(new_src), jnp.asarray(new_tok,
                                                              jnp.int32), pos)
        sum_lp = np.asarray(new_lp, np.float64)
        prefixes = new_pref
        pos += 1
        if len(finished) >= max_candidates:
            break

    if not finished:  # ran out of length: rank the live beams instead
        finished = [(float(sum_lp[b]), prefixes[b]) for b in range(beam_size)]

    # MaximumLikelihoodRanker (decoding.py:173-196): normalize by the FULL
    # sequence length (sot + tokens + eot); avg_logprob reported over
    # tokens+eot like the reference DecodingResult
    best, best_score, best_avg = None, -np.inf, -np.inf
    for slp, toks in finished:
        n = n_sot + len(toks) + 1
        score = (slp / n if length_penalty is None
                 else slp / ((5 + n) / 6) ** length_penalty)
        if score > best_score:
            best, best_score, best_avg = toks, score, slp / (len(toks) + 1)
    return np.asarray(best, np.int32), float(best_avg)


def _compression_ratio(tokens: np.ndarray) -> float:
    import zlib

    raw = np.asarray(tokens, np.int32).tobytes()
    if not raw:
        return 0.0
    return len(raw) / len(zlib.compress(raw))


def decode_with_fallback(params, dims: WhisperDims, mel: jax.Array,
                         temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                         beam_size: int = 5,
                         compression_ratio_threshold: float = 2.4,
                         logprob_threshold: float = -1.0,
                         seed: int = 0, dtype=jnp.float32,
                         language: str | None = None, max_len: int = 128,
                         sot_sequence: tuple[int, ...] = (50258, 50259,
                                                          50359, 50363),
                         eot: int = 50257):
    """Reference transcribe.py decode_with_fallback: try beam search at
    t=0; if the result degenerates (compression ratio above threshold →
    repetition loop, or avg logprob below threshold → low confidence),
    retry with temperature sampling, raising t until acceptable.

    Returns (tokens, info dict with temperature/avg_logprob/
    compression_ratio)."""
    tokens, avg_lp = None, -np.inf
    for ti, temp in enumerate(temperatures):
        if temp == 0.0:
            tokens, avg_lp = beam_decode(
                params, dims, mel, beam_size=beam_size, max_len=max_len,
                dtype=dtype, language=language, sot_sequence=sot_sequence,
                eot=eot)
        else:
            tokens, avg_lp = _sample_decode(
                params, dims, mel, temp, seed=seed + ti, max_len=max_len,
                dtype=dtype, language=language, sot_sequence=sot_sequence,
                eot=eot)
        cr = _compression_ratio(tokens)
        ok = (cr <= compression_ratio_threshold
              and avg_lp >= logprob_threshold)
        if ok or temp == temperatures[-1]:
            return tokens, {"temperature": temp, "avg_logprob": avg_lp,
                            "compression_ratio": cr}
    return tokens, {"temperature": temperatures[-1], "avg_logprob": avg_lp,
                    "compression_ratio": _compression_ratio(tokens)}


def _sample_decode(params, dims: WhisperDims, mel: jax.Array,
                   temperature: float, seed: int = 0,
                   sot_sequence: tuple[int, ...] = (50258, 50259, 50359,
                                                    50363),
                   eot: int = 50257, max_len: int = 128, dtype=jnp.float32,
                   language: str | None = None):
    """Temperature sampling for one segment (GreedyDecoder with t>0 in the
    reference); returns (tokens, avg_logprob)."""
    model = Whisper(dims, dtype=dtype)
    if mel.ndim == 2:
        mel = mel[None]
    if language and len(sot_sequence) >= 2 and language != "auto":
        lang_tok = 50258 + 1 + LANGUAGE_CODES.index(language)
        sot_sequence = (sot_sequence[0], lang_tok, *sot_sequence[2:])
    audio = model.apply(params, mel, method=Whisper.embed_audio)
    n_sot = len(sot_sequence)
    max_len = min(max_len, dims.n_text_ctx - n_sot)
    L = n_sot + max_len
    buf = jnp.full((1, L), eot, jnp.int32)
    buf = buf.at[:, :n_sot].set(jnp.asarray(sot_sequence, jnp.int32)[None])

    @jax.jit
    def step_fn(p, t, a, pos, key):
        logits = model.apply(p, t, a, method=Whisper.logits)
        row = jax.lax.dynamic_slice_in_dim(logits, pos, 1, axis=1)[:, 0]
        lp = jax.nn.log_softmax(row.astype(jnp.float32), axis=-1)
        tok = jax.random.categorical(key, lp / temperature, axis=-1)
        return tok.astype(jnp.int32), lp[0, tok[0]]

    key = jax.random.PRNGKey(seed)
    out, lps = [], []
    pos = n_sot
    for _ in range(max_len):
        key, sub = jax.random.split(key)
        tok, lp = step_fn(params, buf, audio, pos - 1, sub)
        t_i = int(np.asarray(tok)[0])
        lps.append(float(np.asarray(lp)))
        if t_i == eot:
            break
        out.append(t_i)
        buf = buf.at[:, pos].set(tok)
        pos += 1
    avg = float(np.mean(lps)) if lps else -np.inf
    return np.asarray(out, np.int32), avg
