"""ComfyUI-compatible node layer — thin orchestration over the pipelines.

Mirrors the reference custom_nodes/ surface (rvc_nodes.py, audio_nodes.py,
uvr.py, utility_nodes.py): every node is a class with INPUT_TYPES /
RETURN_TYPES / FUNCTION / CATEGORY and the package exports
NODE_CLASS_MAPPINGS (reference __init__.py:12-29). The layer is torch-free
and ComfyUI-optional: nodes work standalone (call their FUNCTION), and
register with ComfyUI when it imports this package.

Caching follows the reference: results keyed by an md5 of all parameters
(reference rvc_nodes.py:193-206), models loaded lazily behind closures.
"""
from __future__ import annotations

import os
from typing import Any

import numpy as np

from ..config import SR_MAP, preset
from ..io.audio import (
    audio_to_bytes,
    bytes_to_audio,
    load_input_audio,
    merge_audio,
    remix_audio,
    save_input_audio,
)
from ..utils import get_hash

_CACHE: dict[str, Any] = {}

SUPPORTED_AUDIO = ["mp3", "flac", "wav"]
PITCH_METHODS = ["rmvpe", "rmvpe+", "crepe", "crepe-tiny", "mangio-crepe",
                 "mangio-crepe-tiny", "pm", "harvest", "dio"]
MERGE_TYPES = ["median", "mean", "min", "max"]


def to_audio_dict(audio: np.ndarray, sr: int) -> dict:
    """ComfyUI AUDIO transport format (reference audio_nodes.py:17)."""
    return {"waveform": np.atleast_2d(audio)[None], "sample_rate": sr}


def from_audio_input(audio) -> tuple[np.ndarray, int]:
    """Accept AUDIO dict / (array, sr) / bytes (reference lib/audio.get_audio)."""
    if callable(audio):
        audio = audio()
    if isinstance(audio, dict):
        wav = np.asarray(audio["waveform"])
        while wav.ndim > 2:
            wav = wav[0]
        return wav, int(audio["sample_rate"])
    if isinstance(audio, bytes):
        return bytes_to_audio(audio)
    return audio


class LoadAudioNode:
    CATEGORY = "rvc_tpu/audio"
    RETURN_TYPES = ("AUDIO",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"path": ("STRING", {"default": ""}),
                             "sr": ("INT", {"default": 44100})}}

    def load(self, path: str, sr: int = 44100):
        audio, out_sr = load_input_audio(path, sr)
        return (to_audio_dict(audio, out_sr),)


def _preview_payload(saved_path: str, *hash_parts) -> list[dict]:
    """Copy a saved file into the temp preview dir and build the
    ``{"ui": {"preview": [...]}}`` entry the JS preview widget listens for
    (reference audio_nodes.py:212-221; web/js/ui_handlers.js previewAudio)."""
    import shutil
    import tempfile

    widget_id = get_hash(saved_path, *hash_parts)
    ext = os.path.splitext(saved_path)[1].lstrip(".") or "wav"
    # ComfyUI serves type="temp" from folder_paths.get_temp_directory();
    # copying anywhere else would 404 the /view request (the reference
    # PreviewAudio writes there too, audio_nodes.py:178). Outside ComfyUI
    # (unit tests, CLI) fall back to the OS temp dir.
    try:
        import folder_paths  # ComfyUI host module

        base = folder_paths.get_temp_directory()
    except Exception:
        base = os.path.join(tempfile.gettempdir(), "rvc_tpu")
    tempdir = os.path.join(base, "preview")
    os.makedirs(tempdir, exist_ok=True)
    audio_name = f"{widget_id}.{ext}"
    shutil.copyfile(saved_path, os.path.join(tempdir, audio_name))
    return [{"filename": audio_name, "type": "temp", "subfolder": "preview",
             "widgetId": widget_id}]


class SaveAudioNode:
    CATEGORY = "rvc_tpu/audio"
    RETURN_TYPES = ("STRING",)
    FUNCTION = "save"
    OUTPUT_NODE = True

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"audio": ("AUDIO",), "path": ("STRING", {"default": "out.wav"})}}

    def save(self, audio, path: str):
        wav, sr = from_audio_input(audio)
        save_input_audio(path, (wav, sr))
        return {"ui": {"preview": _preview_payload(path)}, "result": (path,)}


class PreviewAudioNode:
    """Save + in-browser preview OUTPUT_NODE (reference audio_nodes.py:173-221
    PreviewAudio): writes ``<output_dir>/audio/<filename>.<format>``, copies it
    into the temp preview folder, and returns the ``{"ui": {"preview": ...}}``
    payload plus (output_path, audio) results."""

    CATEGORY = "rvc_tpu/audio"
    RETURN_TYPES = ("STRING", "AUDIO")
    RETURN_NAMES = ("output_path", "audio")
    FUNCTION = "save_audio"
    OUTPUT_NODE = True

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "audio": ("AUDIO",),
            "filename": ("STRING", {"default": "test"}),
            "save_format": (SUPPORTED_AUDIO, {"default": "flac"}),
            "save_channels": ([1, 2], {"default": 1}),
            "overwrite_existing": ("BOOLEAN", {"default": True}),
            "autoplay": ("BOOLEAN", {"default": True}),
        }, "optional": {"output_dir": ("STRING", {"default": "output"})}}

    def save_audio(self, audio, filename: str = "test", save_format: str = "flac",
                   save_channels: int = 1, overwrite_existing: bool = True,
                   autoplay: bool = True, output_dir: str = "output"):
        filename = filename.strip()
        assert filename, "Filename cannot be empty"
        wav, sr = from_audio_input(audio)
        audio_dir = os.path.join(output_dir, "audio")
        os.makedirs(audio_dir, exist_ok=True)
        output_path = os.path.join(audio_dir, f"{filename}.{save_format}")
        if os.path.isfile(output_path) and not overwrite_existing:
            # reference increment_filename_no_overwrite: first free _N suffix
            n = 1
            while os.path.isfile(output_path):
                output_path = os.path.join(
                    audio_dir, f"{filename}_{n}.{save_format}")
                n += 1
        if save_channels == 2 and np.atleast_2d(wav).shape[0] == 1:
            wav = np.repeat(np.atleast_2d(wav), 2, axis=0)
        save_input_audio(output_path, (wav, sr))
        preview = _preview_payload(output_path, save_channels)
        preview[0]["autoplay"] = autoplay
        return {"ui": {"preview": preview},
                "result": (output_path, to_audio_dict(wav, sr))}


class MergeAudioNode:
    CATEGORY = "rvc_tpu/audio"
    RETURN_TYPES = ("AUDIO",)
    FUNCTION = "merge"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"audio1": ("AUDIO",), "audio2": ("AUDIO",),
                             "sr": ("INT", {"default": 40000})}}

    def merge(self, audio1, audio2, sr: int = 40000):
        a1, a2 = from_audio_input(audio1), from_audio_input(audio2)
        mixed, out_sr = merge_audio(a1, a2, sr=sr)
        return (to_audio_dict(mixed, out_sr),)


class DownloadAudioNode:
    """YouTube audio download → AUDIO (reference audio_nodes.py:74-123
    DownloadAudio). Cache-first: a hash-named file under ``output_dir``
    short-circuits the download, so prior downloads keep working offline.
    The fetch itself needs the optional ``yt_dlp`` package + network —
    gated with a clear error, like the model downloader."""

    CATEGORY = "rvc_tpu/audio"
    RETURN_TYPES = ("STRING", "AUDIO")
    RETURN_NAMES = ("audio_name", "audio")
    FUNCTION = "download_audio"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"url": ("STRING", {"default": ""})},
                "optional": {"sr": (["None", 16000, 44100, 48000],
                                    {"default": "None"}),
                             "song_name": ("STRING", {"default": ""}),
                             "format": (SUPPORTED_AUDIO, {"default": "flac"}),
                             "output_dir": ("STRING",
                                            {"default": "input/audio"})}}

    def download_audio(self, url: str, sr="None", song_name: str = "",
                       format: str = "flac", output_dir: str = "input/audio"):
        if "youtube" not in url and "youtu.be" not in url:
            raise ValueError("Please provide a valid youtube URL!")
        widget_id = get_hash(url, sr, format)
        sr = None if sr == "None" else int(sr)
        audio_name = song_name or widget_id
        os.makedirs(output_dir, exist_ok=True)
        audio_path = os.path.join(output_dir, f"{audio_name}.{format}")
        if not os.path.isfile(audio_path):
            try:
                import yt_dlp  # optional dependency, absent offline
            except ImportError as e:
                raise RuntimeError(
                    "DownloadAudio needs the optional 'yt_dlp' package and "
                    "network access; in offline environments place the file "
                    f"at {audio_path} and rerun (cache-first)") from e
            ydl_opts = {
                "format": "bestaudio/best",
                "postprocessors": [{"key": "FFmpegExtractAudio",
                                    "preferredcodec": format}],
                "outtmpl": os.path.splitext(audio_path)[0],
            }
            with yt_dlp.YoutubeDL(ydl_opts) as ydl:
                ydl.download([url])
        audio, out_sr = load_input_audio(audio_path, sr)
        return {"ui": {"preview": [{"filename": os.path.basename(audio_path),
                                    "type": "input", "subfolder": "audio",
                                    "widgetId": widget_id}]},
                "result": (audio_name, to_audio_dict(audio, out_sr))}


class AudioInfoNode:
    """Duration/sample-rate probe (reference audio_nodes.py AudioInfoNode:54)."""

    CATEGORY = "rvc_tpu/audio"
    RETURN_TYPES = ("AUDIO", "FLOAT", "INT")
    RETURN_NAMES = ("audio", "seconds", "sr")
    FUNCTION = "get_info"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"audio": ("AUDIO",)}}

    def get_info(self, audio):
        wav, sr = from_audio_input(audio)
        seconds = float(np.atleast_2d(wav).shape[-1]) / sr
        return (audio, seconds, int(sr))


class ProcessAudioNode:
    """Click/silence cleanup via AudioProcessor (reference audio_nodes.py
    ProcessAudioNode:224 — returns the configured processor plus the
    processed audio when one is supplied)."""

    CATEGORY = "rvc_tpu/audio"
    RETURN_TYPES = ("AUDIO_PROCESSOR", "AUDIO")
    RETURN_NAMES = ("audio_processor", "audio")
    FUNCTION = "process_audio"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "normalize": ("BOOLEAN", {"default": True}),
            "threshold_silence": ("BOOLEAN", {"default": True}),
            "dynamic_threshold": ("BOOLEAN", {"default": True}),
        }, "optional": {
            "audio": ("AUDIO", {"default": None}),
            "dynamic_threshold_sample_size": ("INT", {"default": 4000}),
            "dynamic_threshold_multiplier": ("FLOAT", {"default": 2.0}),
            "dynamic_threshold_fill_method": (["median", "interpolation"],
                                              {"default": "median"}),
            "dynamic_threshold_kernel_size": ("INT", {"default": 5}),
            "silence_threshold_db": ("INT", {"default": -50}),
            "normalize_threshold_db": ("INT", {"default": -1}),
        }}

    def process_audio(self, normalize, threshold_silence, dynamic_threshold,
                      audio=None, dynamic_threshold_sample_size=16000,
                      dynamic_threshold_multiplier=2.0,
                      dynamic_threshold_fill_method="median",
                      dynamic_threshold_kernel_size=5,
                      silence_threshold_db=-50, normalize_threshold_db=-1):
        from ..io.audio import AudioProcessor

        proc = AudioProcessor(
            normalize=normalize, threshold_silence=threshold_silence,
            dynamic_threshold=dynamic_threshold,
            sample_size=dynamic_threshold_sample_size,
            multiplier=dynamic_threshold_multiplier,
            fill_method=dynamic_threshold_fill_method,
            kernel_size=dynamic_threshold_kernel_size,
            silence_threshold_db=silence_threshold_db,
            normalize_threshold_db=normalize_threshold_db)
        out = None
        if audio is not None:
            wav, sr = from_audio_input(audio)
            cleaned, out_sr = proc((wav, sr))
            out = to_audio_dict(cleaned, out_sr)
        return (proc, out)


class AudioBatchValueNode:
    """RMS→per-frame value curve for animation conditioning
    (reference audio_nodes.py:311: AudioBatchValueNode.get_frame_weights)."""

    CATEGORY = "rvc_tpu/audio"
    RETURN_TYPES = ("FLOAT",)
    FUNCTION = "get_frame_weights"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "audio": ("AUDIO",),
            "num_frames": ("INT", {"default": 16}),
            "min_value": ("FLOAT", {"default": 0.0}),
            "max_value": ("FLOAT", {"default": 1.0}),
            "invert": ("BOOLEAN", {"default": False}),
        }}

    def get_frame_weights(self, audio, num_frames: int, min_value: float = 0.0,
                          max_value: float = 1.0, invert: bool = False):
        wav, sr = from_audio_input(audio)
        mono = wav.mean(0) if wav.ndim > 1 else wav
        hop = max(len(mono) // num_frames, 1)
        frames = mono[: num_frames * hop].reshape(num_frames, hop)
        rms = np.sqrt(np.mean(frames**2, axis=-1))
        lo, hi = rms.min(), rms.max()
        norm = (rms - lo) / (hi - lo + 1e-9)
        if invert:
            norm = 1.0 - norm
        vals = (min_value + norm * (max_value - min_value)).tolist()
        return (vals,)


class RVCModelLoaderNode:
    """Lazy .pth loader (reference rvc_nodes.py model() closure)."""

    CATEGORY = "rvc_tpu/rvc"
    RETURN_TYPES = ("RVC_MODEL",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"model_path": ("STRING", {"default": ""})},
                "optional": {"index_path": ("STRING", {"default": ""})}}

    def load(self, model_path: str, index_path: str = ""):
        def closure():
            key = get_hash(model_path, index_path)
            if key not in _CACHE:
                from ..compat.torch_import import (
                    load_rvc_checkpoint,
                    synthesizer_kwargs_from_config,
                )

                params, meta = load_rvc_checkpoint(model_path)
                kwargs = synthesizer_kwargs_from_config(
                    meta["config"], meta["version"], bool(meta["f0"]))
                bank = np.load(index_path) if index_path and os.path.exists(index_path) else None
                _CACHE[key] = {"params": params, "kwargs": kwargs, "meta": meta,
                               "index_bank": bank}
            return _CACHE[key]

        return (closure,)


class HubertLoaderNode:
    CATEGORY = "rvc_tpu/rvc"
    RETURN_TYPES = ("HUBERT_MODEL",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"model_path": ("STRING", {"default": "content-vec-best.safetensors"})}}

    def load(self, model_path: str):
        def closure():
            key = get_hash("hubert", model_path)
            if key not in _CACHE:
                from ..compat.torch_import import load_hubert_safetensors

                params, cfg = load_hubert_safetensors(model_path)
                _CACHE[key] = {"params": params, "cfg": cfg}
            return _CACHE[key]

        return (closure,)


class PitchExtractionParamsNode:
    """Bundle pitch-extraction settings (reference rvc_nodes.py LoadPitchExtractionParams)."""

    CATEGORY = "rvc_tpu/rvc"
    RETURN_TYPES = ("PITCH_EXTRACTION_PARAMS",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "f0_method": (PITCH_METHODS, {"default": "rmvpe"}),
            "f0_autotune": ("BOOLEAN", {"default": False}),
            "merge_type": (MERGE_TYPES, {"default": "median"}),
            "index_rate": ("FLOAT", {"default": 0.75}),
            "filter_radius": ("INT", {"default": 3}),
            "resample_sr": ("INT", {"default": 0}),
            "rms_mix_rate": ("FLOAT", {"default": 0.25}),
            "protect": ("FLOAT", {"default": 0.33}),
            "crepe_hop_length": ("INT", {"default": 160}),
            "rmvpe_path": ("STRING", {"default": ""}),
        }}

    def load(self, **kwargs):
        return (kwargs,)


class RVCNode:
    """Voice conversion (reference rvc_nodes.py:188 RVCNode.convert)."""

    CATEGORY = "rvc_tpu/rvc"
    RETURN_TYPES = ("AUDIO",)
    FUNCTION = "convert"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "audio": ("AUDIO",),
            "model": ("RVC_MODEL",),
            "hubert": ("HUBERT_MODEL",),
            "f0_up_key": ("INT", {"default": 0}),
        }, "optional": {"pitch_params": ("PITCH_EXTRACTION_PARAMS",),
                        "sid": ("INT", {"default": 0})}}

    def convert(self, audio, model, hubert, f0_up_key: int = 0,
                pitch_params: dict | None = None, sid: int = 0):
        from ..pipelines.convert import ConvertSettings, VoiceConverter
        from ..pitch.extractor import PitchExtractor

        wav, sr = from_audio_input(audio)
        pp = dict(pitch_params or {})
        m = model() if callable(model) else model
        h = hubert() if callable(hubert) else hubert
        cache_key = get_hash(get_hash(wav), f0_up_key, sid, sorted(pp.items()))
        if cache_key in _CACHE:
            return (_CACHE[cache_key],)
        extractor = None
        rmvpe_path = pp.pop("rmvpe_path", "")
        if rmvpe_path and os.path.exists(rmvpe_path):
            from ..compat.torch_import import load_rmvpe

            extractor = PitchExtractor(rmvpe_params=load_rmvpe(rmvpe_path))
        vc = VoiceConverter(
            m["params"], m["kwargs"], h["params"], h.get("cfg"),
            pitch=extractor, index_bank=m.get("index_bank"),
        )
        settings = ConvertSettings(sid=sid, f0_up_key=f0_up_key, **{
            k: v for k, v in pp.items() if k in ConvertSettings.__dataclass_fields__
        })
        out, out_sr = vc.convert(wav if wav.ndim == 1 else wav.mean(0), sr, settings)
        result = to_audio_dict(out.astype(np.float32) / 32768.0, out_sr)
        _CACHE[cache_key] = result
        return (result,)


class ProcessDatasetNode:
    """Slice + feature/f0 extraction + filelist (reference rvc_nodes.py:241)."""

    CATEGORY = "rvc_tpu/rvc"
    RETURN_TYPES = ("DATASET_PIPE",)
    FUNCTION = "process"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "input_dir": ("STRING", {"default": ""}),
            "exp_dir": ("STRING", {"default": ""}),
            "sr": (["32k", "40k", "48k"], {"default": "40k"}),
            "hubert": ("HUBERT_MODEL",),
            "f0_method": (PITCH_METHODS, {"default": "rmvpe"}),
            "version": (["v1", "v2"], {"default": "v2"}),
        }}

    def process(self, input_dir, exp_dir, sr, hubert, f0_method="rmvpe", version="v2"):
        from ..pipelines.preprocess import (
            Preprocess,
            build_filelist,
            extract_features,
            generate_mute_fixtures,
        )

        sr_int = SR_MAP[sr]
        h = hubert() if callable(hubert) else hubert
        Preprocess(sr_int, exp_dir).run_dir(input_dir)
        extract_features(exp_dir, h["params"], h.get("cfg"), f0_method=f0_method,
                         version=version)
        mute = os.path.join(exp_dir, "mute")
        generate_mute_fixtures(mute, sr_int, version)
        filelist = build_filelist(exp_dir, sr_int, version=version, mute_dir=mute)
        return ({"filelist": filelist, "sr": sr, "version": version,
                 "exp_dir": exp_dir},)


class TrainParamsNode:
    """Loss-weight / optimizer knobs bundle (reference rvc_nodes.py
    RVCTrainParamsNode:352 → RVC_TRAINING_PARAMS dict)."""

    CATEGORY = "rvc_tpu/rvc"
    RETURN_TYPES = ("RVC_TRAINING_PARAMS",)
    RETURN_NAMES = ("rvc_training_params",)
    FUNCTION = "init"

    @classmethod
    def INPUT_TYPES(cls):
        return {"optional": {
            "batch_size": ("INT", {"default": 4}),
            "c_mel": ("FLOAT", {"default": 45.0}),
            "c_kl": ("FLOAT", {"default": 1.0}),
            "c_tefs": ("FLOAT", {"default": 0.0}),
            "c_hd": ("FLOAT", {"default": 0.0}),
            "c_tsi": ("FLOAT", {"default": 0.0}),
            "c_gp": ("FLOAT", {"default": 0.0}),
            "use_multiscale": ("BOOLEAN", {"default": False}),
            "use_balancer": ("BOOLEAN", {"default": False}),
            "learning_rate": ("FLOAT", {"default": 1e-4}),
        }}

    def init(self, **kwargs):
        return (kwargs,)


class TrainModelNode:
    CATEGORY = "rvc_tpu/rvc"
    RETURN_TYPES = ("STRING",)
    FUNCTION = "train"
    OUTPUT_NODE = True

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "dataset": ("DATASET_PIPE",),
            "model_name": ("STRING", {"default": "model"}),
            "epochs": ("INT", {"default": 100}),
            "batch_size": ("INT", {"default": 4}),
            "save_every_epoch": ("INT", {"default": 10}),
        }, "optional": {
            "train_params": ("RVC_TRAINING_PARAMS",),
        }}

    def train(self, dataset, model_name, epochs=100, batch_size=4,
              save_every_epoch=10, train_params=None):
        import dataclasses

        from ..pipelines.train import TrainRunConfig, train_model

        cfg_name = dataset["sr"] + ("_v2" if dataset["version"] == "v2" else "")
        cfg = preset(cfg_name)
        overrides = dict(epochs=epochs, batch_size=batch_size)
        if train_params:
            tp = dict(train_params)
            tp.pop("use_multiscale", None)  # handled by Trainer.use_multiscale
            tp.pop("use_balancer", None)
            if "batch_size" in tp:
                overrides["batch_size"] = tp.pop("batch_size")
            field_names = set(type(cfg.train).__dataclass_fields__)
            overrides.update({k: v for k, v in tp.items() if k in field_names})
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **overrides))
        run = TrainRunConfig(
            model_dir=os.path.join(dataset["exp_dir"], model_name),
            filelist=dataset["filelist"], total_epochs=epochs,
            save_every_epoch=save_every_epoch, export_name=model_name,
        )
        return (train_model(cfg, run),)


class TrainIndexNode:
    """Retrieval bank from extracted features (reference rvc_nodes.py:500)."""

    CATEGORY = "rvc_tpu/rvc"
    RETURN_TYPES = ("STRING",)
    FUNCTION = "train_index"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"dataset": ("DATASET_PIPE",)}}

    def train_index(self, dataset):
        from ..retrieval.index import train_index

        feat_dim = "3_feature256" if dataset["version"] == "v1" else "3_feature768"
        feat_dir = os.path.join(dataset["exp_dir"], feat_dim)
        feats = np.concatenate(
            [np.load(os.path.join(feat_dir, f)) for f in sorted(os.listdir(feat_dir))]
        )
        index = train_index(feats)
        out = os.path.join(dataset["exp_dir"], "index.npy")
        index.save(out)
        return (out,)


class UVR5Node:
    """Vocal separation (reference custom_nodes/uvr.py:56)."""

    CATEGORY = "rvc_tpu/audio"
    RETURN_TYPES = ("AUDIO", "AUDIO")
    RETURN_NAMES = ("vocals", "instrumentals")
    FUNCTION = "split"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "audio": ("AUDIO",),
            "model_path": ("STRING", {"default": ""}),
            "aggressiveness": ("FLOAT", {"default": 10.0}),
            "use_cache": ("BOOLEAN", {"default": True}),
        }}

    def split(self, audio, model_path: str, aggressiveness: float = 10.0,
              use_cache: bool = True):
        from ..pipelines.separate import route_separator

        wav, sr = from_audio_input(audio)
        key = get_hash("uvr", get_hash(wav), model_path, aggressiveness)
        if use_cache and key in _CACHE:
            out = _CACHE[key]
        else:
            kind = route_separator(model_path)
            sep = _load_separator(kind, model_path, aggressiveness)
            out = sep.run_inference(wav, sr)
            if use_cache:
                _CACHE[key] = out
        v, vs = out["vocals"][0], out["vocals"][1]
        i, is_ = out["instrumentals"][0], out["instrumentals"][1]
        return (
            to_audio_dict(np.asarray(v, np.float32) / 32768.0, vs),
            to_audio_dict(np.asarray(i, np.float32) / 32768.0, is_),
        )


def _load_separator(kind: str, model_path: str, agg: float):
    key = get_hash("sep", kind, model_path)
    if key not in _CACHE:
        from ..pipelines.separate import MDXSeparator, VRSeparator
        from ..ops.bands import ModelParameters

        if kind == "demucs":
            from ..pipelines.separate import DemucsSeparator

            _CACHE[key] = DemucsSeparator(model_path)
            return _CACHE[key]
        if kind == "mdx":
            # .onnx weights auto-mapped onto the native Conv-TDF net
            # (compat/onnx_import.convtdf_params_from_onnx)
            _CACHE[key] = MDXSeparator(model_path)
            return _CACHE[key]
        if kind == "bs_roformer":
            from ..compat.torch_import import load_bs_roformer
            from ..models.bs_roformer import BSRoformerSeparator

            params, cfg = load_bs_roformer(model_path)
            _CACHE[key] = BSRoformerSeparator(params, cfg)
            return _CACHE[key]
        if kind == "mel_roformer":
            from ..compat.torch_import import load_mel_roformer
            from ..models.mel_roformer import MelRoformerSeparator

            params, cfg = load_mel_roformer(model_path)
            _CACHE[key] = MelRoformerSeparator(params, cfg)
            return _CACHE[key]
        import jax
        import torch

        from ..compat.torch_import import vr_params_from_state_dict

        sd = torch.load(model_path, map_location="cpu", weights_only=False)
        params = vr_params_from_state_dict(sd)
        mp = ModelParameters(preset="4band_v2")
        if jax.default_backend() != "cpu":
            from ..pipelines.vr_fused import FusedVRSeparator

            _CACHE[key] = FusedVRSeparator(params, mp, agg=agg)
        else:
            _CACHE[key] = VRSeparator(params, mp, agg=agg)
    sep = _CACHE[key]
    sep.agg = agg
    return sep


NODE_CLASS_MAPPINGS = {
    "RVC_TPU_LoadAudio": LoadAudioNode,
    "RVC_TPU_SaveAudio": SaveAudioNode,
    "RVC_TPU_PreviewAudio": PreviewAudioNode,
    "RVC_TPU_MergeAudio": MergeAudioNode,
    "RVC_TPU_DownloadAudio": DownloadAudioNode,
    "RVC_TPU_AudioInfo": AudioInfoNode,
    "RVC_TPU_ProcessAudio": ProcessAudioNode,
    "RVC_TPU_TrainParams": TrainParamsNode,
    "RVC_TPU_AudioBatchValue": AudioBatchValueNode,
    "RVC_TPU_LoadRVCModel": RVCModelLoaderNode,
    "RVC_TPU_LoadHubert": HubertLoaderNode,
    "RVC_TPU_PitchParams": PitchExtractionParamsNode,
    "RVC_TPU_Convert": RVCNode,
    "RVC_TPU_ProcessDataset": ProcessDatasetNode,
    "RVC_TPU_TrainModel": TrainModelNode,
    "RVC_TPU_TrainIndex": TrainIndexNode,
    "RVC_TPU_UVR5": UVR5Node,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    k: k.replace("RVC_TPU_", "RVC-TPU ") for k in NODE_CLASS_MAPPINGS
}
