"""Checkpointing: orbax save/restore + last-N weight averaging.

Parity targets:
  - the reference keeps the latest K epoch checkpoints (ModelCheckpoint on a
    step counter, `train_OmniAVSR.py:27-34`) and resumes via
    `trainer.fit(ckpt_path=...)` (`:345-349, 418`)
  - post-training averaging of the last N epochs -> `model_avg_N.pth`
    (`utils/avg_checkpoints.py:14-44`); eval loads that state dict.

We checkpoint {step, trainable params, opt state} (frozen weights come from
converted base checkpoints and are not duplicated) and average trainable
trees arithmetically, exactly like `ensemble_original`.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any, keep: int = 4) -> str:
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    _gc_old(ckpt_dir, keep)
    return path


def list_checkpoints(ckpt_dir: str) -> List[str]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = sorted(
        d for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and os.path.isdir(os.path.join(ckpt_dir, d))
    )
    return [os.path.join(os.path.abspath(ckpt_dir), d) for d in out]


def _gc_old(ckpt_dir: str, keep: int) -> None:
    import shutil

    ckpts = list_checkpoints(ckpt_dir)
    for path in ckpts[:-keep] if keep > 0 else []:
        shutil.rmtree(path, ignore_errors=True)


def restore_checkpoint(path: str, template: Any) -> Any:
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def restore_raw(path: str) -> Any:
    """Restore a checkpoint without a template (raw pytree of arrays)."""
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


def restore_trainable(path: str) -> Any:
    """Extract just the trainable tree from a saved TrainState checkpoint
    (what cli drivers save: {step, trainable, opt_state})."""
    raw = restore_raw(path)
    if isinstance(raw, dict) and "trainable" in raw:
        return raw["trainable"]
    return raw


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(ckpt_dir)
    return ckpts[-1] if ckpts else None


def average_last_n(ckpt_dir: str, template: Any, n: int) -> Any:
    """Arithmetic mean of the trainable trees of the last n checkpoints —
    `ensemble_original` (`utils/avg_checkpoints.py:34-44`)."""
    ckpts = list_checkpoints(ckpt_dir)[-n:]
    assert ckpts, f"no checkpoints in {ckpt_dir}"
    acc = None
    for path in ckpts:
        state = restore_checkpoint(path, template)
        tree = state.trainable if hasattr(state, "trainable") else state
        tree = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), tree)
        acc = tree if acc is None else jax.tree_util.tree_map(np.add, acc, tree)
    k = len(ckpts)
    return jax.tree_util.tree_map(lambda x: (x / k).astype(np.float32), acc)
