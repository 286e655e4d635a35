"""ComfyUI entry point: expose the node registry + web widget directory
(reference __init__.py:8-29)."""
from .nodes import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS  # noqa: F401
from .utility_nodes import UTILITY_NODE_CLASS_MAPPINGS
from .stt_nodes import STT_NODE_CLASS_MAPPINGS
from .musetalk_nodes import MUSETALK_NODE_CLASS_MAPPINGS

NODE_CLASS_MAPPINGS = {
    **NODE_CLASS_MAPPINGS,
    **UTILITY_NODE_CLASS_MAPPINGS,
    **STT_NODE_CLASS_MAPPINGS,
    **MUSETALK_NODE_CLASS_MAPPINGS,
}
NODE_DISPLAY_NAME_MAPPINGS = {
    k: k.replace("RVC_TPU_", "RVC-TPU ") for k in NODE_CLASS_MAPPINGS
}

WEB_DIRECTORY = "./web"

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS", "WEB_DIRECTORY"]
