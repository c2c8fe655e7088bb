"""Training checkpoint / resume.

The reference is inference-only; its nearest analog is the model artifact
cache (SURVEY.md §5, models.rs:17-64). Since this framework owns a training
path, it also owns checkpointing: the full :class:`TrainState` (params +
optimizer state + step) round-trips through the same flat-npz format as
model weights, so a checkpoint directory is usable both for resuming
training and for exporting inference weights.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..models.weights import load_params, save_params
from .train import TrainState


def save_checkpoint(ckpt_dir: str | Path, state: TrainState, keep: int = 3) -> Path:
    """Write ``step-N.npz`` into `ckpt_dir`, pruning old checkpoints."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(state.step)
    path = ckpt_dir / f"step-{step:08d}.npz"
    save_params(
        path,
        {"params": state.params, "opt_state": state.opt_state},
        meta={"step": step},
    )
    existing = sorted(ckpt_dir.glob("step-*.npz"))
    for old in existing[:-keep]:
        old.unlink()
    return path


def latest_checkpoint(ckpt_dir: str | Path) -> Optional[Path]:
    ckpts = sorted(Path(ckpt_dir).glob("step-*.npz"))
    return ckpts[-1] if ckpts else None


def restore_checkpoint(path: str | Path, like: TrainState) -> TrainState:
    """Load a checkpoint; `like` provides the opt-state treedef (optimizer
    states contain tuples/namedtuples that the flat format stores as lists)."""
    import jax

    tree, meta = load_params(path)
    params = tree["params"]
    flat_like, treedef = jax.tree.flatten(like.opt_state)
    flat_loaded = jax.tree.leaves(tree["opt_state"])
    assert len(flat_like) == len(flat_loaded), "optimizer state mismatch"
    opt_state = jax.tree.unflatten(treedef, flat_loaded)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.asarray(np.int32(meta["step"])),
    )
