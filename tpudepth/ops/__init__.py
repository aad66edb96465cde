from tpudepth.ops.image import (
    avg_pool,
    global_avg_pool,
    image_gradients,
    max_pool,
    pixel_shuffle,
    reflection_pad2d,
    resize_bilinear,
    resize_nearest,
)
from tpudepth.ops.window import (
    relative_position_index,
    shifted_window_attention_mask,
    window_partition,
    window_reverse,
)
from tpudepth.ops.attention import window_cross_attention

__all__ = [
    "avg_pool",
    "global_avg_pool",
    "image_gradients",
    "max_pool",
    "pixel_shuffle",
    "reflection_pad2d",
    "resize_bilinear",
    "resize_nearest",
    "relative_position_index",
    "shifted_window_attention_mask",
    "window_partition",
    "window_reverse",
    "window_cross_attention",
]
