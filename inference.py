#!/usr/bin/env python
"""Deployment / benchmark CLI — capability parity with
``src/GuideDepth/inference.py``: speedtest protocol (10 warmup + 200 timed
runs, per-run sync; ``:141-186``), AOT-compiled bf16 engine standing in for
the serialized TensorRT fp16 engine (``:189-204``), optional flip-TTA
Eigen-crop accuracy eval (``:208-280``), results file (``:284-297``).
"""

import argparse
import os
import time


def _resolve_data(spec, n_train=32, n_test=8):
    """'synthetic' or 'synthetic:HxW' -> fixture zip path; else pass through."""
    if not str(spec).startswith("synthetic"):
        return spec
    from tpudepth.data.synthetic import ensure_synthetic_zip

    hw = (480, 640)
    if ":" in spec:
        h, w = spec.split(":", 1)[1].split("x")
        hw = (int(h), int(w))
    return ensure_synthetic_zip(
        f"/tmp/tpudepth_synth_{hw[0]}x{hw[1]}.zip",
        n_train=n_train, n_test=n_test, image_hw=hw,
    )


def get_args():
    parser = argparse.ArgumentParser(description="TPU inference engine for GuideDepth")
    parser.set_defaults(evaluate=False)
    parser.add_argument("--eval", dest="evaluate", action="store_true")
    parser.add_argument("--data_path", type=str, default="CSVdata.zip")
    parser.add_argument("--dataset", type=str, default="nyu_reduced",
                        choices=["kitti", "nyu", "nyu_reduced"])
    parser.add_argument("--resolution", type=str, default="half",
                        choices=["full", "half", "mini", "tu_small", "tu_big"])
    parser.add_argument("--model", type=str, default="GuideDepth")
    parser.add_argument("--weights_path", type=str, default=None)
    parser.add_argument("--save_results", type=str, default="./results")
    parser.add_argument("--num_test_runs", type=int, default=200)
    parser.add_argument("--warm_up_runs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--engine_path", type=str, default="",
                        help="serialize the AOT engine here (TRT .engine analogue)")
    parser.add_argument("--timing", type=str, default="auto",
                        choices=["auto", "wall", "scan"],
                        help="speedtest protocol: 'wall' = reference 10+200 "
                             "host-clock runs (correct on real hardware); "
                             "'scan' = scan-differential device timing "
                             "(correct on remote/axon backends where "
                             "block_until_ready only waits for dispatch); "
                             "'auto' detects dispatch-only timing and "
                             "switches to scan")
    return parser.parse_args()


def main():
    args = get_args()
    print(args)

    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpudepth.core.config import EvalConfig
    from tpudepth.data import get_training_testing_data
    from tpudepth.infer.engine import InferenceEngine
    from tpudepth.models import build_model
    from tpudepth.train.checkpoint import load_checkpoint

    config = EvalConfig(model=args.model, dataset=args.dataset,
                        resolution=args.resolution, results_dir=args.save_results)
    h, w = config.image_size

    model = build_model(args.model, dtype=jnp.bfloat16)
    if args.weights_path and os.path.exists(str(args.weights_path)):
        restored = load_checkpoint(args.weights_path)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
    else:
        print("no weights; random init")
        from tpudepth.models.registry import init_model
        variables = init_model(model, jax.random.PRNGKey(0),
                               np.zeros((1, h, w, 3), np.float32))

    shape = (args.batch_size, h, w, 3)
    print(f"Building AOT bf16 engine for {shape} ...")
    t0 = time.time()
    engine = InferenceEngine(model, variables, shape, max_depth=config.max_depth)
    print(f"compiled in {time.time() - t0:.1f}s")

    if args.engine_path:
        engine.serialize(args.engine_path)
        print("serialized engine to", args.engine_path)

    # Two-backend comparison mirroring the reference's PyTorch-fp32 vs
    # TensorRT-fp16 speedtests (src/GuideDepth/inference.py:141-186): the
    # plain-jit f32 path stands in for eager PyTorch, the AOT bf16 engine
    # for the serialized TRT engine.
    from tpudepth.infer.engine import speedtest_auto

    f32_model = build_model(args.model, dtype=jnp.float32)

    @jax.jit
    def jit_forward(image):
        return f32_model.apply(variables, image, train=False)

    example = jnp.zeros(shape, jnp.float32)
    # nested jit inlines under the scan, so one callable serves both protocols
    jit_stats = speedtest_auto(jit_forward, example, args.num_test_runs,
                               args.warm_up_runs, timing=args.timing)
    print("[tpudepth jit f32]     {:.5f} s/frame, {:.1f} FPS, {:.1f} img/s ({})".format(
        jit_stats["seconds_per_frame"], jit_stats["fps"],
        jit_stats["fps"] * args.batch_size, jit_stats["timing"]))
    if "dispatch_only_wall_seconds_per_frame" in jit_stats:
        print("  WARNING: wall-clock protocol measured dispatch only "
              "({:.5f} s/frame) — reporting scan-differential device time".format(
                  jit_stats["dispatch_only_wall_seconds_per_frame"]))

    stats = engine.benchmark(args.num_test_runs, args.warm_up_runs,
                             timing=args.timing)
    print("[tpudepth bf16 engine] {:.5f} s/frame, {:.1f} FPS, {:.1f} img/s ({})".format(
        stats["seconds_per_frame"], stats["fps"], stats["images_per_second"],
        stats["timing"]))
    if "dispatch_only_wall_seconds_per_frame" in stats:
        print("  WARNING: wall-clock protocol measured dispatch only "
              "({:.5f} s/frame) — reporting scan-differential device time".format(
                  stats["dispatch_only_wall_seconds_per_frame"]))
    print("speedup engine/jit: {:.2f}x".format(
        jit_stats["seconds_per_frame"] / stats["seconds_per_frame"]))

    if args.evaluate:
        # Accuracy-evaluate the ENGINE ITSELF (and, when serialized, the
        # deserialized jax.export artifact), mirroring the reference's
        # TRT-engine eval (src/GuideDepth/inference.py:208-280) — the engine
        # output is already in meters (fused inverse_depth_norm).
        from tpudepth.eval.evaluator import AlhashimEvaluator

        data_path = _resolve_data(args.data_path, n_train=8)
        _, test_loader = get_training_testing_data(1, data_path)

        eval_engine = engine
        if args.batch_size != 1:  # eval always runs batch-1 like the reference
            eval_engine = InferenceEngine(model, variables, (1, h, w, 3),
                                          max_depth=config.max_depth)
        evaluator = AlhashimEvaluator(eval_engine, config,
                                      forward_returns_meters=True)
        avg = evaluator.evaluate(test_loader, save_results_to=args.save_results)
        print("[aot_bf16 engine eval]")
        print(AlhashimEvaluator.format_report(avg))

        deser_avg = None
        if args.engine_path:
            deser = InferenceEngine.deserialize(args.engine_path)
            if args.batch_size == 1:
                deser_eval = AlhashimEvaluator(deser, config,
                                               forward_returns_meters=True)
                deser_avg = deser_eval.evaluate(test_loader)
                print("[deserialized engine eval]")
                print(AlhashimEvaluator.format_report(deser_avg))

        os.makedirs(args.save_results, exist_ok=True)
        with open(os.path.join(args.save_results, "inference_results.txt"), "w") as f:
            f.write("backend,s/frame,FPS,img/s,RMSE,Delta1\n")
            f.write("jit_f32,{:.5f},{:.1f},{:.1f},,\n".format(
                jit_stats["seconds_per_frame"], jit_stats["fps"],
                jit_stats["fps"] * args.batch_size))
            f.write("aot_bf16,{:.5f},{:.1f},{:.1f},{:.3f},{:.3f}\n".format(
                stats["seconds_per_frame"], stats["fps"],
                stats["images_per_second"], avg.rmse, avg.delta1))
            if deser_avg is not None:
                f.write("aot_bf16_deserialized,,,,{:.3f},{:.3f}\n".format(
                    deser_avg.rmse, deser_avg.delta1))


if __name__ == "__main__":
    main()
