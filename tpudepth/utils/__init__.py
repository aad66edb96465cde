from tpudepth.utils.viz import colorize, colorize_cpu, hconcat_resize

__all__ = ["colorize", "colorize_cpu", "hconcat_resize"]
