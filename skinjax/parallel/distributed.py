"""Distributed training utilities: put a TrainState + batches onto a mesh.

The sharding rule (parallel/mesh.py) is shape-only, so the same rule tree
applies to params and to the Adam moments inside opt_state — everything that
mirrors a TP-sharded kernel is sharded the same way, everything else is
replicated. Batches shard over the ``data`` axis. After device_put, the
ordinary jitted train step (train/steps.py) runs SPMD: GSPMD inserts the
gradient psums over ``data`` and the activation collectives over ``model``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skinjax.parallel.mesh import fsdp_sharding_rules, param_sharding_rules
from skinjax.train.steps import TrainState


def distribute_state(
    mesh: Mesh, state: TrainState, min_tp_dim: int = 1024, min_tp_conv: int = 0,
    tp_attn: bool = False, fsdp_min_size: int = 0,
) -> TrainState:
    """Shard a TrainState onto the mesh.

    ``fsdp_min_size`` > 0 turns on ZeRO-3-style param/optimizer sharding over
    the ``data`` axis for every leaf at least that many elements (composed
    with whatever TP rule applies first — see fsdp_sharding_rules); 0 keeps
    the replicated-DP default."""
    def put_tree(tree):
        rules = param_sharding_rules(mesh, tree, min_tp_dim, min_tp_conv,
                                     tp_attn)
        if fsdp_min_size:
            rules = fsdp_sharding_rules(
                mesh, tree, min_size=fsdp_min_size, base_rules=rules
            )
        return jax.tree_util.tree_map(jax.device_put, tree, rules)

    return TrainState(
        params=put_tree(state.params),
        batch_stats=put_tree(state.batch_stats),
        opt_state=put_tree(state.opt_state),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )


def shard_batch(mesh: Mesh, batch) -> Dict[str, "jax.Array"]:
    """Shard every leaf's leading (batch) axis over the data axis. Works on
    nested pytrees (token/tabular metadata dicts)."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda v: jax.device_put(jnp.asarray(v), sh), batch
    )
