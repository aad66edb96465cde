from tpudepth.infer.engine import InferenceEngine, speedtest

__all__ = ["InferenceEngine", "speedtest"]
