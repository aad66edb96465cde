from tpudepth.eval.metrics import AverageMeter, Result, ScalarMeter, compute_errors

__all__ = ["AverageMeter", "Result", "ScalarMeter", "compute_errors"]
