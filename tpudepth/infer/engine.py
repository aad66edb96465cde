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
    return {"seconds_per_frame": per_frame, "fps": 1.0 / per_frame,
            "timing": "wall"}


def speedtest_scan(
    fn: Callable,
    example: jax.Array,
    k1: int = 2,
    k2: int = 12,
) -> Dict[str, float]:
    """Scan-differential DEVICE timing.

    On remote-execution backends (the axon TPU tunnel here),
    ``block_until_ready`` returns after dispatch, before execution — the
    wall-clock protocol above then measures dispatch only (observed up to
    ~50x inflation; BASELINE.md timing caveat). This protocol times k1 and k2
    chained executions of ``fn`` inside one jitted ``lax.scan`` (the chain
    forces sequential device execution; fetching one output scalar forces
    completion) and reports the differential — per-run host/dispatch overhead
    cancels out.
    """
    import functools

    @functools.partial(jax.jit, static_argnames="k")
    def run_k(x, k):
        def body(c, _):
            y = fn(c)
            # fold a zero-scaled reduction of the output into the carry so the
            # iterations chain and cannot be DCE'd
            return c + jnp.mean(y).astype(c.dtype) * 0, None

        c, _ = jax.lax.scan(body, x, None, length=k)
        return c

    times = {}
    for k in (k1, k2):
        float(run_k(example, k).reshape(-1)[0].astype(jnp.float32))  # compile+settle
        t0 = time.perf_counter()
        float(run_k(example, k).reshape(-1)[0].astype(jnp.float32))
        times[k] = time.perf_counter() - t0
    per_frame = (times[k2] - times[k1]) / (k2 - k1)
    return {"seconds_per_frame": per_frame, "fps": 1.0 / per_frame,
            "timing": "scan"}


def speedtest_auto(
    fn: Callable,
    example: jax.Array,
    num_test_runs: int = 200,
    warm_up_runs: int = 10,
    timing: str = "auto",
) -> Dict[str, float]:
    """Dispatch to wall / scan timing; ``auto`` self-calibrates: it runs both
    and keeps the scan (device-true) numbers whenever the wall protocol reads
    faster than ~70% of the measured device time — impossible on hardware that
    actually synchronizes, so a sure sign the host timer only saw dispatch."""
    if timing == "wall":
        return speedtest(fn, example, num_test_runs, warm_up_runs)
    if timing == "scan":
        return speedtest_scan(fn, example)
    scan_stats = speedtest_scan(fn, example)
    wall_stats = speedtest(fn, example, num_test_runs, warm_up_runs)
    if wall_stats["seconds_per_frame"] < 0.7 * scan_stats["seconds_per_frame"]:
        scan_stats["dispatch_only_wall_seconds_per_frame"] = (
            wall_stats["seconds_per_frame"])
        return scan_stats
    return wall_stats


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

    def benchmark(self, num_test_runs: int = 200, warm_up_runs: int = 10,
                  timing: str = "auto") -> Dict[str, float]:
        """``timing``: 'wall' = reference 10+200 protocol, 'scan' =
        scan-differential device time, 'auto' (default) = wall unless it is
        detectably dispatch-only (axon), then scan. Scan times ``self._fn``
        (the engine's function re-jitted inside the scan) rather than the AOT
        executable — same computation, chained on device."""
        example = jnp.zeros(self.input_shape, jnp.float32)
        if timing == "wall":
            stats = speedtest(self._compiled, example, num_test_runs, warm_up_runs)
        elif timing == "scan":
            stats = speedtest_scan(self._fn, example)
        else:
            scan_stats = speedtest_scan(self._fn, example)
            stats = speedtest(self._compiled, example, num_test_runs, warm_up_runs)
            if stats["seconds_per_frame"] < 0.7 * scan_stats["seconds_per_frame"]:
                scan_stats["dispatch_only_wall_seconds_per_frame"] = (
                    stats["seconds_per_frame"])
                stats = scan_stats
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
