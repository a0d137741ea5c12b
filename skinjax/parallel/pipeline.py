"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

The reference is single-GPU (SURVEY.md §2) — pipelining is part of the
TPU-native scaling design, for the deep homogeneous encoders in the backbone
zoo (ViT-large / BEiT-v2-large, 24 identical blocks: the largest published
backbone, frugality_bacc_by_models.py:14-16 at 307 M params).

Design (scaling-book pipelining recipe, SPMD form):

  * stage parameters live STACKED with a leading ``(K,)`` axis sharded over
    the pipeline mesh axis — device ``i`` holds only stage ``i``'s weights
    (so pipelining is also a K-way param-memory split, like FSDP but along
    depth);
  * the schedule is one ``lax.scan`` over ``T = M + K - 1`` ticks inside a
    ``shard_map``: every tick each device applies ITS stage to its current
    activation and ``ppermute``-shifts the result to its right neighbour.
    Device 0 feeds a fresh microbatch each tick; device K-1's outputs from
    tick K-1 onward are the pipeline outputs. Bubble fraction (K-1)/T — pick
    ``num_microbatches >> K``;
  * backward needs no second schedule: JAX differentiates through
    ``scan`` + ``ppermute`` (transpose = reverse scan + inverse permute),
    which IS the reverse pipeline, microbatched the same way;
  * dp×pp composes: the microbatch axis can shard over ``data`` while stages
    shard over ``model`` — pass ``data_axis``.

Stage functions must be shape-preserving (activation in == activation out),
which transformer encoder blocks are, and must stay finite on the zero
activations that fill the pipeline bubble (LayerNorm's eps guarantees this
for the ViT family): bubble outputs are discarded, but a NaN there would
poison the zero cotangents flowing back through them.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def gpipe(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "model",
    num_microbatches: int,
    data_axis: str | None = None,
):
    """Run ``K = mesh.shape[axis]`` stages over ``x`` in pipeline.

    stage_params: pytree whose every leaf has leading dim K (stage i's slice
        on device i). Build with ``stack_stage_params``.
    stage_fn(params_i, act) -> act: applies ONE stage; shape-preserving.
    x: (B, ...) activations entering stage 0. B % num_microbatches == 0; if
        ``data_axis`` is given, the microbatch size must also divide by that
        axis (microbatches shard over it — dp×pp).
    Returns stage_{K-1}(...stage_0(x)) with exact numerics (the schedule
    only reorders the same per-microbatch computation).
    """
    K = mesh.shape[axis]
    B = x.shape[0]
    M = num_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M
    xs = x.reshape(M, mb, *x.shape[1:])
    T = M + K - 1
    perm = [(i, (i + 1) % K) for i in range(K)]

    def local(pp, xs_local):
        p = jax.tree_util.tree_map(lambda a: a[0], pp)
        idx = jax.lax.axis_index(axis)
        state0 = jnp.zeros_like(xs_local[0])

        def tick(state, t):
            feed = xs_local[jnp.clip(t, 0, M - 1)]
            inp = jnp.where(idx == 0, feed, state)
            out = stage_fn(p, inp)
            return jax.lax.ppermute(out, axis, perm), out

        _, outs = jax.lax.scan(tick, state0, jnp.arange(T))
        return outs  # (T, mb_local, ...): valid on the last device, t >= K-1

    mb_spec = data_axis if data_axis else None
    outs = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(None, mb_spec)),
        out_specs=P(axis, mb_spec),
        check_vma=False,
    )(stage_params, xs)
    # out axis 0 stacks the K devices' (T, ...) blocks: the last device's
    # outputs at ticks [K-1, T) are microbatches 0..M-1 in order
    lo = (K - 1) * T + (K - 1)
    return outs[lo:lo + M].reshape(B, *x.shape[1:])


def stack_stage_params(per_stage_params: list):
    """[K × pytree] -> one pytree with a leading (K,) axis on every leaf."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_stage_params
    )


def vit_pipeline_apply(
    vit,
    params,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "model",
    num_microbatches: int = 8,
    data_axis: str | None = None,
):
    """Pipeline a ``backbones.vit.ViT`` forward over ``mesh.shape[axis]``
    stages of ``depth/K`` blocks each (loop param layout, pool output).

    Patch embed + final norm/pool run outside the pipeline (they are a
    trivial fraction of the FLOPs); the K stages cover the depth-dominant
    encoder. Numerically identical to ``vit.apply`` — pinned by
    tests/test_pipeline.py against the sequential module.
    """
    from flax import linen as nn

    from skinjax.models.backbones.vit import ViTBlock

    K = mesh.shape[axis]
    if vit.depth % K:
        raise ValueError(f"depth {vit.depth} not divisible by {K} stages")
    bps = vit.depth // K
    block = ViTBlock(vit.dim, vit.num_heads,
                     layerscale_init=vit.layerscale_init, dtype=vit.dtype)

    stage_trees = []
    for s in range(K):
        blocks = [params[f"block{s * bps + j}"] for j in range(bps)]
        stage_trees.append(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *blocks))
    stacked = stack_stage_params(stage_trees)  # leaves: (K, bps, ...)

    def stage_fn(p_stage, act):
        def body(a, p):
            return block.apply({"params": p}, a), None

        act, _ = jax.lax.scan(body, act, p_stage)
        return act

    B, H, W, _ = x.shape
    emb = nn.Conv(vit.dim, (vit.patch, vit.patch),
                  strides=(vit.patch, vit.patch), dtype=vit.dtype).apply(
        {"params": params["patch_embed"]}, x)
    emb = emb.reshape(B, -1, vit.dim)
    cls = jnp.asarray(params["cls_token"]).astype(emb.dtype)
    emb = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, vit.dim)), emb], axis=1)
    emb = emb + jnp.asarray(params["pos_embed"]).astype(emb.dtype)

    y = gpipe(stage_fn, stacked, emb, mesh=mesh, axis=axis,
              num_microbatches=num_microbatches, data_axis=data_axis)

    y = nn.LayerNorm(epsilon=1e-6, dtype=vit.dtype).apply(
        {"params": params["norm"]}, y)
    if vit.pool == "mean":
        return y[:, 1:].mean(axis=1)
    return y[:, 0]
