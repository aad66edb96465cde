"""AOT-compiled serving engine — the TensorRT-equivalent deployment path.

The reference serializes a TensorRT fp16 engine via torch2trt
(``src/GuideDepth/inference.py:189-204``) and benchmarks PyTorch vs TRT with
a 10-warmup / 200-timed-run protocol (``:141-186``). The TPU-native
equivalent: ``jax.jit(...).lower(...).compile()`` ahead-of-time at a fixed
shape in bf16, with optional serialization of the compiled executable via
``jax.export``, plus the same speedtest protocol (block_until_ready around
each timed run mirroring the reference's cuda.synchronize).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def speedtest(
    fn: Callable,
    example: jax.Array,
    num_test_runs: int = 200,
    warm_up_runs: int = 10,
) -> Dict[str, float]:
    """10-warmup / 200-timed protocol (``src/GuideDepth/inference.py:141-161``).

    Each timed run synchronizes (block_until_ready), matching the reference's
    ``torch.cuda.synchronize()`` bracketing.
    """
    for _ in range(warm_up_runs):
        fn(example).block_until_ready()
    times = 0.0
    for _ in range(num_test_runs):
        t0 = time.perf_counter()
        fn(example).block_until_ready()
        times += time.perf_counter() - t0
    per_frame = times / num_test_runs
    return {"seconds_per_frame": per_frame, "fps": 1.0 / per_frame}


class InferenceEngine:
    """Fixed-shape AOT inference engine for a model + params."""

    def __init__(
        self,
        model,
        variables,
        input_shape: Tuple[int, int, int, int],
        compute_dtype=jnp.bfloat16,
        flip_tta: bool = False,
        max_depth: Optional[float] = None,
    ):
        self.model = model
        self.variables = variables
        self.input_shape = input_shape
        self.compute_dtype = compute_dtype
        self.max_depth = max_depth

        def forward(image):
            pred = model.apply(variables, image.astype(compute_dtype), train=False)
            pred = pred.astype(jnp.float32)
            if max_depth is not None:
                # fuse the meters conversion into the engine, mirroring the
                # reference TRT eval consuming inverse-normalized predictions
                # (src/GuideDepth/inference.py:240-244 via training.py:191-196)
                from tpudepth.train.trainer import inverse_depth_norm

                pred = inverse_depth_norm(pred, max_depth)
            return pred

        def forward_tta(image):
            p = forward(image)
            pf = forward(jnp.flip(image, axis=2))
            return 0.5 * (p + jnp.flip(pf, axis=2))

        self._fn = forward_tta if flip_tta else forward
        example = jax.ShapeDtypeStruct(input_shape, jnp.float32)
        # AOT compile at the fixed deployment shape (TRT-engine analogue)
        self._compiled = jax.jit(self._fn).lower(example).compile()

    def __call__(self, image) -> jax.Array:
        return self._compiled(jnp.asarray(image, jnp.float32))

    def benchmark(self, num_test_runs: int = 200, warm_up_runs: int = 10) -> Dict[str, float]:
        example = jnp.zeros(self.input_shape, jnp.float32)
        stats = speedtest(self._compiled, example, num_test_runs, warm_up_runs)
        batch = self.input_shape[0]
        stats["images_per_second"] = stats["fps"] * batch
        return stats

    def serialize(self, path: str):
        """Persist the traced/exported function (engine-file analogue).
        Exports the engine's actual function (incl. flip-TTA / meters
        conversion when configured)."""
        from jax import export as jax_export

        exp = jax_export.export(jax.jit(self._fn))(
            jax.ShapeDtypeStruct(self.input_shape, jnp.float32)
        )
        with open(path, "wb") as f:
            f.write(exp.serialize())

    @staticmethod
    def deserialize(path: str) -> Callable:
        from jax import export as jax_export

        with open(path, "rb") as f:
            exp = jax_export.deserialize(bytearray(f.read()))
        return lambda x: exp.call(jnp.asarray(x, jnp.float32))
