"""Keras .h5 weight import — capability parity with
``src/load_weight_from_keras.py`` (which is broken in the reference snapshot:
it imports modules that don't exist there, ``:13-22``).

The reference's working idea: walk a Keras DenseDepth ``nyu.h5`` and copy
kernels into a torch model, transposing conv kernels (3,2,0,1)
(``src/load_weight_from_keras.py:49-83``). For flax the story is simpler —
Keras stores conv kernels HWIO, which IS the flax layout, so conversion is a
name-mapping plus optional BN stat split. This module gives:

- :func:`load_keras_h5` — read every weight in an .h5 into
  ``{layer_name: {weight_name: np.ndarray}}`` (pure h5py, no TF import).
- :func:`keras_dense_kernel` / :func:`keras_conv_kernel` — layout adapters.
- :func:`my_depth_norm` — the Alhashim inverse target transform
  ``maxDepth / x`` (``src/load_weight_from_keras.py:90-91``).
- :func:`clip_predictions` — the reference's prediction clipping
  ``clip(maxDepth/pred, minDepth, maxDepth) / maxDepth`` (``:92-100``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_keras_h5(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Flatten a Keras-format .h5 (either a weights file with a
    ``model_weights`` group or a raw weights hierarchy) into
    {layer: {weight: array}}."""
    import h5py

    out: Dict[str, Dict[str, np.ndarray]] = {}

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                parts = name.split("/")
                layer = "/".join(parts[:-1]) or parts[0]
                out.setdefault(layer, {})[parts[-1]] = np.asarray(obj)

        root.visititems(visit)
    return out


def keras_conv_kernel(k: np.ndarray) -> np.ndarray:
    """Keras conv kernels are already HWIO — identity for flax."""
    return np.asarray(k)


def keras_dense_kernel(k: np.ndarray) -> np.ndarray:
    """Keras Dense kernels are (in, out) — identity for flax Dense."""
    return np.asarray(k)


def keras_bn(layer: Dict[str, np.ndarray]):
    """(scale, bias, mean, var) from a Keras BatchNormalization layer dict."""
    return (
        layer.get("gamma:0", layer.get("gamma")),
        layer.get("beta:0", layer.get("beta")),
        layer.get("moving_mean:0", layer.get("moving_mean")),
        layer.get("moving_variance:0", layer.get("moving_variance")),
    )


def my_depth_norm(x, max_depth: float = 1000.0):
    """``my_DepthNorm`` (``src/load_weight_from_keras.py:90-91``)."""
    return max_depth / x


def clip_predictions(pred, min_depth: float = 10.0, max_depth: float = 1000.0):
    """Reference prediction post-processing (``src/load_weight_from_keras.py:92-100``)."""
    return np.clip(my_depth_norm(pred, max_depth), min_depth, max_depth) / max_depth


def import_keras_sequential(weights, variables, layer_order=None):
    """The reference's positional import walk, retargeted at a flax tree.

    ``src/load_weight_from_keras.py:47-83`` iterates the torch model's
    parameters IN ORDER and consumes the Keras ``model.get_weights()`` list
    positionally: conv weights get transposed (3,2,0,1), conv biases copied,
    and each norm 'bias' additionally consumes running mean + var. Flax conv
    kernels are already HWIO (= Keras layout), so the walk here is: traverse
    ``variables['params']`` in network order; a 'kernel' consumes one Keras
    array as-is (Dense is (in, out) in both frameworks too); a BatchNorm
    'scale' consumes gamma and its 'bias' consumes beta + moving_mean +
    moving_var into ``batch_stats``.

    Flax dicts iterate ALPHABETICALLY, which is neither definition order at
    the module level (BatchNorm_0 < Conv_0) nor inside a module (bias <
    kernel). Inside a module the known keras order is enforced
    (kernel/scale before bias); across modules pass ``layer_order`` — either
    a sequence of top-level submodule names in network order, or a mapping
    from "/"-joined tree paths ("" for the top level) to per-level
    orderings, for nested trees whose alphabetical sibling order is not the
    network order (a positional walk imports such siblings silently swapped
    when their params share shapes).

    Args:
      weights: the flat ``model.get_weights()``-order list of arrays.
      variables: flax variables dict with 'params' (and optionally
        'batch_stats') whose structure to fill.
      layer_order: optional network ordering — a sequence (top level only)
        or a {path: ordering} mapping applied at any level.

    Returns a NEW variables dict; raises ValueError on shape mismatch or
    leftover weights, like ``load_state_dict`` would.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))
    it = iter(list(weights))

    _LEAF_PRIORITY = {"kernel": 0, "scale": 0, "bias": 1}

    def take(shape):
        try:
            w = np.asarray(next(it))
        except StopIteration:
            raise ValueError("keras weight list exhausted early")
        if tuple(w.shape) != tuple(shape):
            raise ValueError(f"shape mismatch: keras {w.shape} vs {shape}")
        return w

    def level_order(path):
        if layer_order is None:
            return None
        if hasattr(layer_order, "get") and not isinstance(layer_order, (list, tuple)):
            return layer_order.get("/".join(path))
        return layer_order if not path else None

    def walk(node, path):
        if isinstance(node, dict) or hasattr(node, "items"):
            keys = list(node.keys())
            order = level_order(path)
            if order is not None:
                missing = [k for k in keys if k not in order]
                if missing:
                    raise ValueError(
                        f"layer_order misses {missing} at "
                        f"{'/'.join(path) or '<top>'}"
                    )
                keys = [k for k in order if k in keys]
            else:
                keys.sort(key=lambda k: (_LEAF_PRIORITY.get(k, 0), k))
            out = {}
            is_bn = "scale" in node and "bias" in node and len(node) == 2
            for k in keys:
                out[k] = walk(node[k], path + (k,))
                if is_bn and k == "bias":
                    # norm bias consumes beta + running stats (:73-81)
                    sub = stats
                    for p in path:
                        sub = sub[p]
                    sub["mean"] = take(sub["mean"].shape)
                    sub["var"] = take(sub["var"].shape)
            return out
        return take(np.asarray(node).shape)

    new_params = walk(params, ())
    leftover = sum(1 for _ in it)
    if leftover:
        raise ValueError(f"{leftover} keras weights left unconsumed")
    out = {"params": new_params}
    if variables.get("batch_stats"):
        out["batch_stats"] = stats
    return out
