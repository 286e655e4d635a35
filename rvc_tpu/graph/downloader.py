"""Model catalog + download helper (reference custom_nodes/settings/downloader.py).

Catalog names follow the reference's HF-hosted model zoo so the same model
ids resolve; downloads are stdlib urllib (no requests dependency) and
gated — offline environments just point ``model_path`` at local files.
"""
from __future__ import annotations

import os
import urllib.request
import zipfile

BASE_MODELS_DIR = os.environ.get(
    "RVC_TPU_MODELS_DIR", os.path.join(os.path.expanduser("~"), ".rvc_tpu", "models")
)

RVC_DOWNLOAD_LINK = "https://huggingface.co/datasets/SayanoAI/RVC-Studio/resolve/main/"

# Catalogs mirroring reference settings/downloader.py:14-70
RVC_MODELS = ["RVC/Claire.pth", "RVC/Sayano.pth", "RVC/Mae_v2.pth", "RVC/Fuji.pth",
              "RVC/Monika.pth"]
RVC_INDEX = ["RVC/.index/added_IVF1063_Flat_nprobe_1_Sayano_v2.index"]
BASE_MODELS = ["content-vec-best.safetensors", "rmvpe.pt"]
UVR_MODELS = [
    "UVR/HP5-vocals+instrumentals.pth",
    "UVR/UVR-MDX-NET-vocal_FT.onnx",
    "UVR/UVR-DeEcho-DeReverb.pth",
    "UVR/MDX23C-8KFFT-InstVoc_HQ.ckpt",
]
PRETRAINED_MODELS = [
    "pretrained_v2/f0D40k.pth", "pretrained_v2/f0G40k.pth",
    "pretrained_v2/f0D48k.pth", "pretrained_v2/f0G48k.pth",
]


def download_file(params: tuple[str, str], chunk_size: int = 1 << 20) -> bool:
    """(dest_path, url) — streaming download (reference downloader.py:72-82)."""
    path, url = params
    if os.path.exists(path):
        return True
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".part"
    try:
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(chunk_size)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, path)
        return True
    except Exception as e:  # offline / 404 → caller falls back to local files
        print(f"download failed for {url}: {e}")
        if os.path.exists(tmp):
            os.remove(tmp)
        return False


def model_downloader(model_name: str) -> str | None:
    """Resolve a catalog model to a local path, downloading if needed
    (reference custom_nodes/utils.py:9)."""
    dest = os.path.join(BASE_MODELS_DIR, model_name)
    if os.path.exists(dest):
        return dest
    ok = download_file((dest, RVC_DOWNLOAD_LINK + model_name))
    return dest if ok else None


def extract_zip_without_structure(zip_path: str, out_dir: str) -> list[str]:
    """Flatten-extract a zip (reference downloader.py:105)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            name = os.path.basename(info.filename)
            if not name:
                continue
            target = os.path.join(out_dir, name)
            with zf.open(info) as src, open(target, "wb") as dst:
                dst.write(src.read())
            written.append(target)
    return written
