"""Vision Transformer backbone (Flax) — timm ``vit_*_patch16_224`` topology.

Used by the LiwTERM baseline (liwtermModel.py:25-36, ``vit_large_patch16_224``)
and as a generic transformer encoder in the backbone registry. Patch embed is
a strided conv (one big MXU matmul per image); attention runs in bf16 with
fp32 softmax via skinjax.ops.MultiHeadAttention. Returns the CLS token
(B, D) by default, or the full token sequence with ``tokens=True`` (the
reference's seq-aware fusion variants, multimodalGated.py:131-176).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from skinjax.ops.attention import MultiHeadAttention

# SKINJAX_REMAT=block: rematerialize each encoder block in the backward —
# the opt-in capacity lever shared with resnet.py:41-48 / beit.py
_REMAT = os.environ.get("SKINJAX_REMAT", "")


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: Optional[float] = None  # BEiT-v2 uses 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        def scale(y, name):
            if self.layerscale_init is None:
                return y
            g = self.param(
                name, nn.initializers.constant(self.layerscale_init), (self.dim,)
            )
            return y * g.astype(y.dtype)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = MultiHeadAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            y, y, y, deterministic=deterministic
        )
        x = x + scale(y, "gamma1")
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_in")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(y)
        return x + scale(y, "gamma2")


class _ViTScanBody(nn.Module):
    """One ViTBlock in (carry, _) -> (carry, None) form for ``nn.scan``."""

    dim: int
    num_heads: int
    layerscale_init: Optional[float] = None
    dtype: Optional[jnp.dtype] = None
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, _):
        x = ViTBlock(
            self.dim, self.num_heads, layerscale_init=self.layerscale_init,
            dtype=self.dtype, name="block",
        )(x, deterministic=self.deterministic)
        return x, None


def stack_block_params(params: dict, depth: int) -> dict:
    """Convert per-layer ``block{i}`` params (loop layout / importer output)
    to the stacked ``blocks/block`` layout of ``ViT(scan_blocks=True)`` —
    every leaf gains a leading (depth,) axis. Non-block entries pass through.
    """
    import jax

    out = {k: v for k, v in params.items() if not k.startswith("block")}
    blocks = [params[f"block{i}"] for i in range(depth)]
    out["blocks"] = {
        "block": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *blocks
        )
    }
    return out


class ViT(nn.Module):
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch: int = 16
    pool: str = "cls"  # "cls" | "mean" (BEiT-v2 mean-pools patch tokens)
    layerscale_init: Optional[float] = None
    dtype: Optional[jnp.dtype] = None
    # nn.scan over the depth: the block body is traced/compiled ONCE instead
    # of `depth` times — cuts trace+XLA time for deep encoders (vit-large 24
    # blocks) at identical math. Params live stacked under blocks/block with
    # a leading (depth,) axis; use ``stack_block_params`` to convert importer
    # output. Opt-in: the loop layout stays the importer/checkpoint default.
    scan_blocks: bool = False
    # Megatron-style sequence parallelism: name a mesh axis to pin the token
    # axis of the residual stream between blocks (parallel/mesh.py seq_shard)
    # — LN/residual regions then run token-sharded, and with tp_attn-sharded
    # kernels GSPMD inserts the SP all-gather/reduce-scatter pairs. No-op
    # off-mesh; numerics exact (tests/test_parallel.py).
    seq_shard_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, tokens: bool = False,
                 capture: bool = False, feature_delta=None):
        """``capture``/``feature_delta`` expose a spatial (B, gh, gw, D)
        activation grid for CAM (xai/cam.py). For ``pool='cls'`` the
        injection point is the patch grid ENTERING the final block (the
        last token mixing before CLS pooling — a delta on the final grid
        would be invisible to the CLS read-out); for ``pool='mean'`` it is
        the post-norm patch grid the head averages. Mirrors the reference's
        hook-on-last-block practice (gradcam_plusplus.py:169-188)."""
        if (capture or feature_delta is not None) and self.scan_blocks:
            raise ValueError("CAM capture requires the loop block layout "
                             "(scan_blocks=False)")
        B, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        x = nn.Conv(
            self.dim,
            (self.patch, self.patch),
            strides=(self.patch, self.patch),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(B, -1, self.dim)  # (B, T, D)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.dim)
        ).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, x.shape[1], self.dim)
        ).astype(x.dtype)
        x = x + pos
        if self.scan_blocks:
            body = nn.scan(
                _ViTScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
            )(
                self.dim, self.num_heads,
                layerscale_init=self.layerscale_init, dtype=self.dtype,
                deterministic=not train, name="blocks",
            )
            x, _ = body(x, None)
        else:
            fmap = None
            for i in range(self.depth):
                if (self.pool == "cls" and i == self.depth - 1
                        and (capture or feature_delta is not None)):
                    grid = x[:, 1:].reshape(B, gh, gw, self.dim)
                    if feature_delta is not None:
                        grid = grid + feature_delta.astype(grid.dtype)
                    fmap = grid
                    x = jnp.concatenate(
                        [x[:, :1], grid.reshape(B, gh * gw, self.dim)], axis=1
                    )
                if self.seq_shard_axis is not None:
                    from skinjax.parallel.mesh import seq_shard

                    x = seq_shard(x, self.seq_shard_axis)
                if _REMAT == "block" and train:
                    def body(mdl, y, _i=i):
                        return ViTBlock(
                            mdl.dim, mdl.num_heads,
                            layerscale_init=mdl.layerscale_init,
                            dtype=mdl.dtype, name=f"block{_i}",
                        )(y, deterministic=False)

                    x = nn.remat(body, prevent_cse=False)(self, x)
                else:
                    x = ViTBlock(
                        self.dim, self.num_heads,
                        layerscale_init=self.layerscale_init,
                        dtype=self.dtype, name=f"block{i}",
                    )(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if tokens:
            return x
        if self.pool == "mean":
            grid = x[:, 1:].reshape(B, gh, gw, self.dim)
            if feature_delta is not None:
                grid = grid + feature_delta.astype(grid.dtype)
            pooled = grid.reshape(B, gh * gw, self.dim).mean(axis=1)
            return (pooled, grid) if capture else pooled
        if capture:
            return x[:, 0], fmap
        return x[:, 0]


vit_tiny = partial(ViT, dim=192, depth=12, num_heads=3)
vit_small = partial(ViT, dim=384, depth=12, num_heads=6)
vit_base = partial(ViT, dim=768, depth=12, num_heads=12)
vit_large = partial(ViT, dim=1024, depth=24, num_heads=16)
# BEiT-v2 lives in skinjax.models.backbones.beit (timm-layout, importable)
