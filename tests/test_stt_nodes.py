"""STT prompt-conditioning tests (reference custom_nodes/stt.py:31-97).

Covers the self-contained keyworder (SGRank-contract TextRank ranker),
the lexicon sentiment tagger (reference polarity→tag thresholds), and the
prompt-schedule node wiring (weights syntax, sentiment slot, durations).
"""
import numpy as np

from rvc_tpu.graph.stt_nodes import (BatchedTranscriptionEncoderNode,
                                     extract_keywords, limit_sentence,
                                     polarity, sentiment_tag)


def test_keywords_rank_central_terms():
    text = ("The neural network model separates vocals from music. "
            "The model uses a neural network trained on music stems, "
            "and the network predicts vocal masks for the music.")
    tags = extract_keywords(text, max_words=5)
    terms = [t.strip() for t in tags.split(",")]
    assert len(terms) <= 5
    joined = " ".join(terms)
    assert "network" in joined and "music" in joined
    # stopwords never appear
    assert not any(t in ("the", "and", "from") for t in terms)


def test_keywords_includes_bigrams_and_dedups():
    text = ("deep learning deep learning deep learning changes audio "
            "processing forever, deep learning wins")
    tags = extract_keywords(text, max_words=4)
    assert "deep learning" in tags
    # the absorbed unigrams are deduped against the selected bigram
    terms = [t.strip() for t in tags.split(",")]
    assert terms.count("deep") == 0 and terms.count("learning") == 0


def test_keywords_empty_and_limit():
    assert extract_keywords("", max_words=5) == ""
    assert extract_keywords("the and of to", max_words=5) == ""
    many = " ".join(f"word{i} filler{i}" for i in range(30))
    assert len(extract_keywords(many, max_words=3).split(",")) == 3


def test_limit_sentence():
    assert limit_sentence("one two three four", max_words=2) == "one two"


def test_polarity_signs_and_negation():
    assert polarity("this is wonderful and amazing") > 0.5
    assert polarity("terrible awful horrible") < -0.5
    assert polarity("completely neutral spectrogram") == 0.0
    # negation flips/damps (TextBlob-style -0.5 scaling)
    assert polarity("not good") < polarity("good")
    assert polarity("very happy") >= polarity("happy")


def test_sentiment_tag_thresholds():
    # thresholds mirror reference stt.py:90-95
    assert sentiment_tag("I am miserable, crying, this is the worst") == \
        "sad, tears, crying"
    assert sentiment_tag("a sad problem") == "sad, tears"
    assert sentiment_tag("absolutely wonderful amazing perfect") == \
        "happy, smile, laughing"
    assert sentiment_tag("it was pretty fun") == "slight smile"
    assert sentiment_tag("the audio file has ten channels") == ""


def test_encoder_node_schedule_weights_and_sentiment():
    node = BatchedTranscriptionEncoderNode()
    transcription = {
        "text": "whatever",
        "chunks": [
            {"text": "I love this wonderful happy beautiful song",
             "timestamp": (0.0, 4.0)},
            {"text": "the sound is dark and sad here", "timestamp": (4.0, 9.5)},
        ],
    }
    conds, batch_prompt, durations, n, frames, prompts = node.get_prompt(
        transcription, use_tags=True, max_words=4, prefix="pre", suffix="suf",
        weights=0.85, use_sentiment=True)
    assert n == 2 and durations == [4, 6] and frames == 10
    assert prompts[0].startswith("pre, (") and prompts[0].endswith("suf")
    assert ":0.850)" in prompts[0]
    assert "happy, smile, laughing" in prompts[0]
    assert "sad" in prompts[1]
    assert '"0":' in batch_prompt and '"1":' in batch_prompt
    assert conds == []  # no CLIP bound


def test_encoder_node_defaults_no_weights_no_sentiment():
    node = BatchedTranscriptionEncoderNode()
    transcription = {"text": "t", "chunks": [{"text": "great happy song",
                                              "timestamp": (0.0, 2.0)}]}
    _, _, _, _, _, prompts = node.get_prompt(transcription)
    assert "(" not in prompts[0] and "smile" not in prompts[0]
