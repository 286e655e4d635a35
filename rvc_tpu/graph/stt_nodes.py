"""STT nodes: Whisper transcription → prompt-schedule conditioning.

Reference: custom_nodes/stt.py — transcribe audio with Whisper (chunked,
timestamped), then turn per-chunk text into CLIP prompt schedules (keyword
extraction per chunk, optional sentiment tag). The reference uses HF
transformers-whisper + spaCy; here transcription runs on the native Flax
Whisper (models/whisper.py) and keyword extraction is a self-contained
frequency/stopword scorer (spaCy is an optional upgrade, gated).
"""
from __future__ import annotations

import json
import os
import re
from collections import Counter

import numpy as np

from ..utils import get_hash

SUPPORTED_LANGUAGES = ["en", "es", "fr", "de", "it", "pt", "ja", "zh", "ko"]

_STOPWORDS = set(
    "the a an and or but if then else of to in on for with at by from as is are was "
    "were be been being have has had do does did will would can could should may "
    "might it its it's this that these those i you he she we they them his her my "
    "your our their me him us so not no yes oh".split()
)


def extract_keywords(text: str, max_words: int = 16, **_) -> str:
    """Frequency-scored keyword extraction (stop-worded); reference uses
    spaCy noun-chunking (stt.py init_spacy_model) — same contract."""
    words = re.findall(r"[A-Za-z']+", text.lower())
    content = [w for w in words if w not in _STOPWORDS and len(w) > 2]
    counts = Counter(content)
    ranked = [w for w, _ in counts.most_common(max_words)]
    return ", ".join(ranked)


def limit_sentence(text: str, max_words: int = 16, **_) -> str:
    return " ".join(text.split()[:max_words])


class WhisperLoaderNode:
    CATEGORY = "rvc_tpu/stt"
    RETURN_TYPES = ("WHISPER_MODEL",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"model_path": ("STRING", {"default": "whisper/tiny.pt"})}}

    def load(self, model_path: str):
        def closure():
            from ..models.whisper import load_whisper

            params, dims = load_whisper(model_path)
            return {"params": params, "dims": dims, "id": model_path}

        return (closure,)


class AudioTranscriptionNode:
    """Whisper transcription with per-chunk timestamps (reference
    stt.py:224 AudioTranscriptionNode.transcribe)."""

    CATEGORY = "rvc_tpu/stt"
    RETURN_TYPES = ("TRANSCRIPTION", "INT")
    RETURN_NAMES = ("transcription", "audio_frames")
    FUNCTION = "transcribe"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"audio": ("AUDIO",), "model": ("WHISPER_MODEL",)},
                "optional": {"chunk_seconds": ("INT", {"default": 30}),
                             "tokenizer_path": ("STRING", {"default": ""}),
                             "language": ("STRING", {"default": ""}),
                             "timestamps": (["chunk", "segment"],
                                            {"default": "chunk"})}}

    def transcribe(self, audio, model, chunk_seconds: int = 30,
                   tokenizer_path: str = "", language: str = "",
                   timestamps: str = "chunk"):
        import jax.numpy as jnp

        from .nodes import from_audio_input
        from ..io.audio import remix_audio
        from ..models.whisper import (decode_with_timestamps, greedy_decode,
                                      log_mel_spectrogram)

        wav, sr = from_audio_input(audio)
        mono, _ = remix_audio((wav, sr), target_sr=16000, norm=True)
        m = model() if callable(model) else model
        tokenizer = _load_tokenizer(tokenizer_path)

        def to_text(token_ids):
            if tokenizer:
                return tokenizer.decode([t for t in token_ids if t < 50257])
            return " ".join(str(t) for t in token_ids)

        chunks = []
        step = chunk_seconds * 16000
        for start in range(0, len(mono), step):
            seg = mono[start : start + step]
            seg = np.pad(seg, (0, 30 * 16000 - len(seg)))
            mel = log_mel_spectrogram(jnp.asarray(seg, jnp.float32)[None])
            if timestamps == "segment":
                # model-emitted timestamp tokens, 0.02 s resolution
                # (reference HF pipeline return_timestamps=True)
                off = start / 16000
                segs = decode_with_timestamps(m["params"], m["dims"], mel,
                                              language=language or None)[0]
                for s0, s1, toks in segs:
                    chunks.append({"text": to_text(toks).strip(),
                                   "timestamp": (off + s0, off + s1)})
                if segs:
                    continue
                # no timestamp pairs decoded → fall through to chunk-level
            tokens = greedy_decode(m["params"], m["dims"], mel,
                                   language=language or None)
            chunks.append({
                "text": to_text(tokens[0].tolist()).strip(),
                "timestamp": (start / 16000, min((start + step) / 16000,
                                                 len(mono) / 16000)),
            })
        transcription = {"text": " ".join(c["text"] for c in chunks), "chunks": chunks}
        frames = int(np.ceil(len(mono) / 16000))
        return (transcription, frames)


def _load_tokenizer(path: str):
    if not path:
        try:
            from transformers import WhisperTokenizer

            # local_files_only: in an offline environment the default
            # network path retries DNS for minutes before failing
            return WhisperTokenizer.from_pretrained("openai/whisper-tiny",
                                                    local_files_only=True)
        except Exception:
            return None
    from transformers import WhisperTokenizer

    return WhisperTokenizer.from_pretrained(path)


class BatchedTranscriptionEncoderNode:
    """Chunks → per-interval prompt schedule + CLIP conditioning (reference
    stt.py:300 BatchedTranscriptionEncoderNode.get_prompt)."""

    CATEGORY = "rvc_tpu/stt"
    RETURN_TYPES = ("CONDITIONING", "STRING", "INT", "INT", "INT", "STRING")
    RETURN_NAMES = ("conditioning", "batch_prompt_text", "duration_list",
                    "num_chunks", "num_frames", "prompt_text_list")
    OUTPUT_IS_LIST = (False, False, False, False, False, True)
    FUNCTION = "get_prompt"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"transcription": ("TRANSCRIPTION",)},
                "optional": {
                    "clip": ("CLIP",),
                    "use_tags": ("BOOLEAN", {"default": False}),
                    "max_words": ("INT", {"default": 16}),
                    "max_chunks": ("INT", {"default": 0}),
                    "prefix": ("STRING", {"default": "masterpiece, best quality"}),
                    "suffix": ("STRING", {"default": ""}),
                    "weights": ("FLOAT", {"default": 1.0}),
                }}

    def get_prompt(self, transcription, clip=None, use_tags=False, max_words=16,
                   max_chunks=0, prefix="", suffix="", weights=1.0, **_):
        chunks = transcription["chunks"]
        if max_chunks:
            chunks = chunks[:max_chunks]
        process = extract_keywords if use_tags else limit_sentence
        prompts, durations, conds = [], [], []
        for chunk in chunks:
            text = process(chunk["text"], max_words=max_words)
            full = ", ".join(p for p in (prefix, text, suffix) if p)
            t0, t1 = chunk.get("timestamp", (0, 1))
            durations.append(max(int(round((t1 or 0) - (t0 or 0))), 1))
            prompts.append(full)
            if clip is not None:
                tokens = clip.tokenize(full)
                cond, pooled = clip.encode_from_tokens(tokens, return_pooled=True)
                conds.append([cond * weights, {"pooled_output": pooled}])
        batch_prompt = "\n".join(
            f'"{i}": "{p}"' for i, p in enumerate(prompts)
        )
        num_frames = int(sum(durations))
        return (conds, batch_prompt, durations, len(chunks), num_frames, prompts)


STT_NODE_CLASS_MAPPINGS = {
    "RVC_TPU_LoadWhisper": WhisperLoaderNode,
    "RVC_TPU_Transcribe": AudioTranscriptionNode,
    "RVC_TPU_TranscriptionEncoder": BatchedTranscriptionEncoderNode,
}
