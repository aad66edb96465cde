"""Checkpoint save/load with both reference schemas.

Root stack: a single rolling ``checkpoints/global_checkpoint.pth`` holding
{'epoch', 'model_state_dict', 'optimizer_state_dict', 'loss'}
(``src/train.py:147-153``). GuideDepth stack: per-epoch ``checkpoint_{e}.pth``
holding {'epoch', 'val_losses', 'model', 'optimizer', 'lr_scheduler'}
(``src/GuideDepth/training.py:166-178``).

Storage is orbax (atomic, async-capable, pytree-native) rather than torch
pickles; the torch->flax converter in :mod:`tpudepth.models.torch_import`
covers importing the reference's actual ``.pth`` files for parity evals.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, payload: Dict[str, Any]):
    """Save a pytree payload (epoch, params, opt_state, ...) atomically."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)
