from tpudepth.models.registry import build_model, MODEL_NAMES

__all__ = ["build_model", "MODEL_NAMES"]
