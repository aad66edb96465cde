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
