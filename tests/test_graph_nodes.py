"""Node-layer tests: registry integrity + host-side audio nodes.

Reference surface: custom_nodes/{audio_nodes,rvc_nodes,uvr,utility_nodes}.py
— nodes must be standalone-callable (no ComfyUI import), declare the
INPUT_TYPES/RETURN_TYPES/FUNCTION contract, and the audio nodes must
round-trip waveforms through the AUDIO dict transport.
"""
import os

import numpy as np
import pytest

from rvc_tpu.graph import NODE_CLASS_MAPPINGS


def test_registry_contract():
    assert len(NODE_CLASS_MAPPINGS) >= 25
    for name, cls in NODE_CLASS_MAPPINGS.items():
        assert name.startswith("RVC_TPU_"), name
        assert callable(getattr(cls, "INPUT_TYPES", None)), name
        assert isinstance(cls.RETURN_TYPES, tuple), name
        fn = getattr(cls, "FUNCTION", None)
        assert fn and callable(getattr(cls, fn, None)), name
        spec = cls.INPUT_TYPES()
        assert "required" in spec or "optional" in spec, name


def _sine(seconds=0.5, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def test_save_load_info_roundtrip(tmp_path):
    from rvc_tpu.graph.nodes import (AudioInfoNode, LoadAudioNode,
                                     SaveAudioNode, to_audio_dict)

    wav = _sine()
    p = str(tmp_path / "a.wav")
    saved = SaveAudioNode().save(to_audio_dict(wav, 16000), p)
    assert saved["result"] == (p,)
    assert saved["ui"]["preview"][0]["type"] == "temp"  # JS widget payload
    (audio,) = LoadAudioNode().load(p, sr=16000)
    out, seconds, sr = AudioInfoNode().get_info(audio)
    assert sr == 16000 and abs(seconds - 0.5) < 0.01
    got = np.asarray(audio["waveform"]).reshape(-1)
    assert np.max(np.abs(got[: len(wav)] - wav)) < 1e-3


def test_preview_audio_node(tmp_path):
    from rvc_tpu.graph.nodes import PreviewAudioNode, to_audio_dict

    wav = _sine()
    node = PreviewAudioNode()
    out = node.save_audio(to_audio_dict(wav, 16000), filename="clip",
                          save_format="wav", output_dir=str(tmp_path))
    path, audio = out["result"]
    assert os.path.isfile(path) and path.endswith("clip.wav")
    preview = out["ui"]["preview"][0]
    assert preview["subfolder"] == "preview" and preview["autoplay"] is True
    # no-overwrite mode picks the next free _N suffix (reference
    # increment_filename_no_overwrite)
    out2 = node.save_audio(to_audio_dict(wav, 16000), filename="clip",
                           save_format="wav", overwrite_existing=False,
                           output_dir=str(tmp_path))
    assert out2["result"][0].endswith("clip_1.wav")
    # stereo expansion
    out3 = node.save_audio(to_audio_dict(wav, 16000), filename="st",
                           save_format="wav", save_channels=2,
                           output_dir=str(tmp_path))
    assert np.atleast_2d(np.asarray(out3["result"][1]["waveform"])[0]).shape[0] == 2


def test_merge_latent_batches():
    from rvc_tpu.graph.utility_nodes import MergeLatentBatchesNode

    lat1 = {"samples": np.zeros((2, 4, 8, 8)), "noise_mask": np.ones((2, 1, 8, 8))}
    lat2 = {"samples": np.ones((3, 4, 8, 8))}
    (merged,) = MergeLatentBatchesNode().merge([lat1, lat2])
    assert merged["samples"].shape == (5, 4, 8, 8)
    assert merged["batch_index"] == list(range(5))
    assert merged["noise_mask"].shape == (2, 1, 8, 8)
    # no masks at all -> field absent
    (m2,) = MergeLatentBatchesNode().merge([lat2])
    assert "noise_mask" not in m2


def test_download_audio_cache_first(tmp_path):
    from rvc_tpu.graph.nodes import DownloadAudioNode
    from rvc_tpu.io.audio import save_input_audio

    node = DownloadAudioNode()
    with pytest.raises(ValueError):
        node.download_audio("https://example.com/x")

    # cache hit: pre-placed file short-circuits the network entirely
    wav = _sine()
    save_input_audio(str(tmp_path / "song.wav"), (wav, 16000))
    res = node.download_audio("https://youtube.com/watch?v=x", sr=16000,
                              song_name="song", format="wav",
                              output_dir=str(tmp_path))
    name, audio = res["result"]
    assert name == "song"
    assert np.asarray(audio["waveform"]).size >= len(wav) - 1

    # cache miss offline → clear gated error naming the expected path
    with pytest.raises(RuntimeError, match="yt_dlp"):
        node.download_audio("https://youtube.com/watch?v=y",
                            song_name="missing", format="wav",
                            output_dir=str(tmp_path))


def test_i18n_locales_complete():
    """Every shipped locale covers the same keys (reference ships
    en_US/es_ES/zh_CN under i18n/)."""
    import json
    import os

    from rvc_tpu.i18n import I18N_DIR, I18nAuto

    locales = sorted(f for f in os.listdir(I18N_DIR) if f.endswith(".json"))
    assert {"en_US.json", "es_ES.json", "zh_CN.json"} <= set(locales)
    keysets = {}
    for f in locales:
        with open(os.path.join(I18N_DIR, f), encoding="utf-8") as fh:
            keysets[f] = set(json.load(fh))
    base = keysets["en_US.json"]
    assert len(base) >= 30
    for f, ks in keysets.items():
        assert ks == base, f"{f} keys diverge from en_US"

    zh = I18nAuto("zh_CN")
    assert zh("Convert voice") == "变声"
    assert zh("unmapped-key") == "unmapped-key"  # passthrough
    assert I18nAuto("xx_XX").language == "en_US"  # fallback
