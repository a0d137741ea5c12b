"""Orbax checkpointing: params + batch_stats + opt_state + step, with true
mid-training resume — the capability gap called out in SURVEY.md §5 (the
reference saves bare state_dicts with no optimizer state,
utils/early_stopping.py:86-99).

Also provides a torch-state_dict importer hook (see
skinjax.models.torch_import) for parity checks against reference checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from skinjax.train.steps import TrainState


def save_checkpoint(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
    }, force=True)
    ckptr.wait_until_finished()


def _reshard_like(restored, template):
    """Re-apply the template's mesh shardings to host-restored leaves, so a
    resumed run on a mesh keeps its TP/FSDP layout instead of silently
    falling back to replicated default placement."""
    def put(r, t):
        sh = getattr(t, "sharding", None)
        if isinstance(sh, jax.sharding.NamedSharding):
            return jax.device_put(r, sh)
        return r

    return jax.tree_util.tree_map(put, restored, template)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": jax.device_get(template.params),
        "batch_stats": jax.device_get(template.batch_stats),
        "opt_state": jax.device_get(template.opt_state),
        "step": int(template.step),
    }
    restored = ckptr.restore(path, target)
    import dataclasses

    return dataclasses.replace(
        template,
        params=_reshard_like(restored["params"], template.params),
        batch_stats=_reshard_like(
            restored["batch_stats"], template.batch_stats),
        opt_state=_reshard_like(restored["opt_state"], template.opt_state),
        step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
    )


def save_params(path: str, params: Any) -> None:
    """Params-only checkpoint (the reference's end-of-fold model.pth analog)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(params), force=True)
    ckptr.wait_until_finished()


def restore_params(path: str, template: Any) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, jax.device_get(template))
