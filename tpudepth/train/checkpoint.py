"""Checkpoint save/load with both reference schemas.

Root stack: a single rolling ``checkpoints/global_checkpoint.pth`` holding
{'epoch', 'model_state_dict', 'optimizer_state_dict', 'loss'}
(``src/train.py:147-153``). GuideDepth stack: per-epoch ``checkpoint_{e}.pth``
holding {'epoch', 'val_losses', 'model', 'optimizer', 'lr_scheduler'}
(``src/GuideDepth/training.py:166-178``).

Storage is orbax rather than torch pickles; saves go through a process-wide
``AsyncCheckpointer`` so training does not block on serialization (the
reference's ``torch.save`` stalls the epoch loop). ``load_checkpoint`` and
``wait_for_checkpoints`` barrier on in-flight saves; ``Trainer.fit`` calls
the barrier before returning (an atexit hook alone is NOT sufficient —
CPython stops executor threads before atexit runs, after which orbax's
commit futures cannot be scheduled). The torch->flax converter in
:mod:`tpudepth.models.torch_import` covers importing the reference's actual
``.pth`` files for parity evals.
"""

from __future__ import annotations

import atexit
import os
import threading
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

_ASYNC_LOCK = threading.Lock()
_ASYNC: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC
    with _ASYNC_LOCK:
        if _ASYNC is None:
            _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            atexit.register(wait_for_checkpoints)
    return _ASYNC


def wait_for_checkpoints():
    """Block until every async save has committed to disk."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_checkpoint(path: str, payload: Dict[str, Any], blocking: bool = False):
    """Save a pytree payload (epoch, params, opt_state, ...) atomically.

    Non-blocking by default: serialization overlaps the next train epoch.
    Pass ``blocking=True`` (or call :func:`wait_for_checkpoints`) when the
    file must exist on return.
    """
    path = os.path.abspath(path)
    ckptr = _async_checkpointer()
    ckptr.save(path, payload, force=True)
    if blocking:
        ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = os.path.abspath(path)
    wait_for_checkpoints()  # an in-flight save of this path must land first
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)
