"""merv_tpu: TPU-native multi-encoder video-language framework.

Top-level convenience exports (parity with ``import merv`` usage in the
reference): model loading + registry inspection.
"""

__version__ = "0.1.0"

__all__ = [
    "available_model_names",
    "available_models",
    "get_model_description",
    "load_vid",
]

_LAZY = {
    "available_model_names": "merv_tpu.models.load_vid",
    "available_models": "merv_tpu.models.load_vid",
    "get_model_description": "merv_tpu.models.load_vid",
    "load_vid": "merv_tpu.models.load_vid",
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
