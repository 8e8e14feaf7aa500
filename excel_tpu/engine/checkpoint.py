"""Checkpoint save/resume with orbax (reference utils/pyutils.py:114-181).

The reference ships bare `torch.save(model.state_dict())` every eval
interval and leaves its full save/resume path unwired (SURVEY.md §5.4).
Here the full train state — trainable head params, optax state, step — is
checkpointed; the frozen CLIP comes from the converted-weights asset and is
never stored in training checkpoints.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    """Write <ckpt_dir>/step_<n>; returns the path."""
    step = int(np.asarray(state.step))
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    with ocp.PyTreeCheckpointer() as ckpter:
        # overwrite like the reference's torch.save (scripts/train_voc.py:254)
        # — re-running into a work dir must not abort at the save
        ckpter.save(path, {"step": np.asarray(state.step),
                           "head": state.head,
                           "opt_state": state.opt_state},
                    force=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{max(steps)}")


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (shapes/dtypes/sharding)."""
    item = {"step": np.asarray(template.step), "head": template.head,
            "opt_state": template.opt_state}
    with ocp.PyTreeCheckpointer() as ckpter:
        restored = ckpter.restore(os.path.abspath(path), item=item)
    return TrainState(step=jax.numpy.asarray(restored["step"]),
                      head=restored["head"],
                      opt_state=restored["opt_state"])


def save_head_npz(path: str, head: Any) -> None:
    """Portable head-only export (the reference's state_dict analogue)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(head)
    np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v)
                      for k, v in flat})


def load_head_npz(path: str, template: Any) -> Any:
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [jax.numpy.asarray(data[jax.tree_util.keystr(k)])
              for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
