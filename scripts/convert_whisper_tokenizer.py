"""One-time converter: public Whisper BPE ranks → the repo's own artifact.

Reads GPT-2-style vocab.json + merges.txt (the public OpenAI Whisper
tokenizer data — from an openai-whisper install, a HuggingFace snapshot,
or a vendored copy) and writes ``assets/whisper/<name>.tokenizer.json.gz``
in the rvc_tpu.whisper_bpe.v1 format consumed by
models/whisper_bpe.load_tokenizer. Same pattern as the weight converters
in compat/: external-format data in, first-party artifact out.

Usage: python scripts/convert_whisper_tokenizer.py <src_dir> <gpt2|multilingual>
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rvc_tpu.models.whisper_bpe import load_tokenizer, save_artifact


def convert(src_dir: str, name: str) -> str:
    with open(os.path.join(src_dir, "vocab.json"), encoding="utf-8") as f:
        vocab = json.load(f)
    merges: list[tuple[str, str]] = []
    with open(os.path.join(src_dir, "merges.txt"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#version"):
                continue
            a, b = line.split(" ")
            merges.append((a, b))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "assets", "whisper", f"{name}.tokenizer.json.gz")
    save_artifact(out, vocab, merges, multilingual=(name == "multilingual"))
    # self-check: load + roundtrip
    tok = load_tokenizer(out, multilingual=(name == "multilingual"))
    ids = tok.encode("Hello, world! How are you?")
    assert tok.decode(ids) == "Hello, world! How are you?", tok.decode(ids)
    print(f"wrote {out} ({os.path.getsize(out)} bytes, "
          f"{len(vocab)} vocab, {len(merges)} merges)")
    return out


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    convert(sys.argv[1], sys.argv[2])
