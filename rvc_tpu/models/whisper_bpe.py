"""Native Whisper BPE tokenizer: token ids → text with no transformers dep.

Whisper uses GPT-2-style byte-level BPE (reference
lib/musetalk/whisper/whisper/tokenizer.py builds a HF GPT2TokenizerFast from
vendored vocab.json/merges.txt). Here the public ranks are consumed from
this repo's own converted artifact (``assets/whisper/<name>.tokenizer.json.gz``,
produced once by scripts/convert_whisper_tokenizer.py — same pattern as the
.pth/ONNX weight converters in compat/), and decoding is first-party:

  * decode: id → token string → byte-decode (GPT-2 printable-byte
    bijection) → UTF-8. Special/timestamp ids (>= eot) are skipped.
  * encode: tiktoken when available (the ranks table IS a valid tiktoken
    mergeable_ranks map because GPT-2 vocab ids are merge-ordered);
    otherwise a pure-Python BPE with the GPT-2 split pattern.

Layouts: multilingual (eot=50257, text ids 0..50256) and gpt2/English
(eot=50256) — matching models/whisper.py's id constants.
"""
from __future__ import annotations

import functools
import gzip
import json
import os

# GPT-2 word-split pattern (used by all whisper tokenizers)
PAT_STR = (r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
           r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's bijection byte value → printable unicode char: printable
    ASCII/latin-1 bytes map to themselves, the rest to 256+k."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


@functools.lru_cache(maxsize=1)
def _unicode_to_bytes() -> dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


def _token_to_bytes(token: str) -> bytes:
    inv = _unicode_to_bytes()
    return bytes(inv[c] for c in token)


class WhisperBPE:
    """Byte-level BPE codec over a whisper vocab.

    vocab: token-string → id (text tokens only is fine; specials like
    ``<|endoftext|>`` are recognized by pattern and never byte-decoded).
    merges: ordered (a, b) pairs; optional — needed only for the
    pure-Python encode fallback.
    """

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 multilingual: bool = True):
        self.multilingual = multilingual
        self.eot = 50257 if multilingual else 50256
        self._id_to_bytes: dict[int, bytes] = {}
        self._ranks: dict[bytes, int] = {}
        for tok, i in vocab.items():
            if tok.startswith("<|") and tok.endswith("|>"):
                continue
            b = _token_to_bytes(tok)
            self._id_to_bytes[i] = b
            self._ranks[b] = i
        self._merge_ranks = {tuple(m): r for r, m in enumerate(merges)}
        self._vocab = vocab
        self._tiktoken = None

    # -- decode ---------------------------------------------------------------
    def decode(self, ids) -> str:
        """Text from token ids; special/timestamp ids are dropped."""
        data = b"".join(self._id_to_bytes[int(i)] for i in ids
                        if int(i) in self._id_to_bytes)
        return data.decode("utf-8", errors="replace")

    # -- encode ---------------------------------------------------------------
    def _tiktoken_enc(self):
        if self._tiktoken is None:
            import tiktoken

            self._tiktoken = tiktoken.Encoding(
                name=f"whisper_{'multi' if self.multilingual else 'gpt2'}",
                pat_str=PAT_STR,
                mergeable_ranks=self._ranks,
                special_tokens={"<|endoftext|>": self.eot},
            )
        return self._tiktoken

    def encode(self, text: str) -> list[int]:
        try:
            return self._tiktoken_enc().encode(text)
        except ImportError:
            return self._encode_py(text)

    def _encode_py(self, text: str) -> list[int]:
        import regex

        b2u = bytes_to_unicode()
        out: list[int] = []
        for word in regex.findall(PAT_STR, text):
            sym = [b2u[b] for b in word.encode("utf-8")]
            while len(sym) > 1:
                pairs = [(self._merge_ranks.get((sym[i], sym[i + 1]),
                                                1 << 30), i)
                         for i in range(len(sym) - 1)]
                rank, i = min(pairs)
                if rank >= 1 << 30:
                    break
                sym[i : i + 2] = [sym[i] + sym[i + 1]]
            out.extend(self._vocab[s] for s in sym)
        return out


# -- artifact IO --------------------------------------------------------------

def save_artifact(path: str, vocab: dict[str, int],
                  merges: list[tuple[str, str]], multilingual: bool) -> None:
    payload = {"format": "rvc_tpu.whisper_bpe.v1",
               "multilingual": multilingual,
               "vocab": vocab,
               "merges": [list(m) for m in merges]}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False, separators=(",", ":"))


@functools.lru_cache(maxsize=8)
def load_artifact(path: str) -> WhisperBPE:
    """Cached: building the ~50k-token byte tables costs ~0.1 s; a node
    graph transcribing N clips should pay it once, not per call."""
    with gzip.open(path, "rt", encoding="utf-8") as f:
        payload = json.load(f)
    assert payload.get("format") == "rvc_tpu.whisper_bpe.v1", path
    return WhisperBPE(payload["vocab"],
                      [tuple(m) for m in payload["merges"]],
                      payload["multilingual"])


@functools.lru_cache(maxsize=8)
def _load_hf_file(path: str, multilingual: bool) -> WhisperBPE:
    """HF fast-tokenizer ``tokenizer.json``: vocab + merges live under
    the "model" key."""
    with open(path, encoding="utf-8") as f:
        payload = json.load(f)
    model = payload["model"]
    merges = [tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
              for m in model["merges"]]
    return WhisperBPE(model["vocab"], merges, multilingual)


@functools.lru_cache(maxsize=8)
def _load_hf_dir(base: str, multilingual: bool) -> WhisperBPE:
    """HF snapshot layout: vocab.json + merges.txt (the reference's
    vendored whisper assets use exactly this pair,
    lib/musetalk/whisper/whisper/tokenizer.py)."""
    with open(os.path.join(base, "vocab.json"), encoding="utf-8") as f:
        vocab = json.load(f)
    merges: list[tuple[str, str]] = []
    with open(os.path.join(base, "merges.txt"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#version"):
                continue
            a, _, b = line.partition(" ")
            merges.append((a, b))
    return WhisperBPE(vocab, merges, multilingual)


def _repo_assets() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "assets", "whisper")


def _try_load(base: str, name: str, multilingual: bool,
              explicit: bool) -> WhisperBPE | None:
    """One search location. For an EXPLICIT user path, HF formats (a fast
    ``tokenizer.json`` file, or a snapshot dir with vocab.json+merges.txt)
    load natively too; an explicit path that exists but can't be parsed
    returns None so the caller's HF fallback keeps the reference
    ``from_pretrained(path)`` semantics — it is never silently replaced by
    the repo's committed artifact."""
    if os.path.isfile(base):
        try:
            return load_artifact(base)
        except Exception:
            if not explicit:
                return None
        try:
            return _load_hf_file(base, multilingual)
        except Exception:
            return None
    if os.path.isdir(base):
        cand = os.path.join(base, f"{name}.tokenizer.json.gz")
        if os.path.isfile(cand):
            return load_artifact(cand)
        if explicit and os.path.isfile(os.path.join(base, "vocab.json")):
            try:
                return _load_hf_dir(base, multilingual)
            except Exception:
                return None
    return None


def load_tokenizer(path: str | None = None,
                   multilingual: bool = True) -> WhisperBPE | None:
    """Find and load the native tokenizer.

    Explicit ``path``: this repo's artifact, an HF ``tokenizer.json``, or
    an HF snapshot dir — anything else (e.g. a hub id) returns None for
    the caller's transformers fallback. Otherwise:
    $RVC_TPU_WHISPER_TOKENIZER → the repo's committed assets/whisper/.
    """
    name = "multilingual" if multilingual else "gpt2"
    if path:
        return _try_load(path, name, multilingual, explicit=True)
    for base in (os.environ.get("RVC_TPU_WHISPER_TOKENIZER"), _repo_assets()):
        if base:
            tok = _try_load(base, name, multilingual, explicit=False)
            if tok is not None:
                return tok
    return None
