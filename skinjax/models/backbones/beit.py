"""BEiT / BEiT-v2 backbone — timm ``beit.py`` layout (Flax).

``beitv2_large_patch16_224`` is in the reference's published BACC table
(frugality_bacc_by_models.py:5-17) and loads through the generic timm path
(loadImageModelClassifier.py:117-121). timm's BEiT differs from plain ViT in
exactly the ways that matter for weight import:

- no absolute position embedding; per-block relative position bias with a
  table of (2h-1)(2w-1)+3 entries (3 extras for cls↔token/cls↔cls),
- packed qkv weight with bias only on q and v (k bias is a fixed zero),
- per-block layer-scale params ``gamma_1``/``gamma_2`` (init 1e-5),
- head: mean over patch tokens (cls excluded) → ``fc_norm`` LayerNorm
  (``norm`` is Identity in the fc_norm configuration timm ships).

TPU notes: the relative-position index map is a static numpy gather folded at
trace time; attention logits accumulate in fp32; everything else is standard
batched MXU matmuls.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# SKINJAX_REMAT=block: rematerialize each encoder block in the backward
# (same opt-in capacity lever as resnet.py:41-48). For beitv2_large on one
# v5e the unrematerialized step OOMs above B=32 (measured, DESIGN §5h);
# storing only block-boundary activations restores the batch headroom.
_REMAT = os.environ.get("SKINJAX_REMAT", "")


def beit_relative_position_index(h: int, w: int) -> np.ndarray:
    """timm beit.gen_relative_position_index for a (h, w) token grid with a
    cls token: (h*w+1, h*w+1) int map into a ((2h-1)(2w-1)+3, heads) table."""
    num_rel = (2 * h - 1) * (2 * w - 1)
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    idx = np.zeros((h * w + 1, h * w + 1), dtype=np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel      # cls -> all
    idx[0:, 0] = num_rel + 1  # all -> cls
    idx[0, 0] = num_rel + 2   # cls -> cls
    return idx


class BeitAttention(nn.Module):
    """Packed qkv with q/v-only biases + per-block relative position bias."""

    dim: int
    num_heads: int
    grid: Tuple[int, int]  # (h, w) patch grid
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv_w = self.param(
            "qkv_kernel", nn.initializers.xavier_uniform(), (C, 3 * C)
        )
        q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = x @ qkv_w.astype(x.dtype) + bias.astype(x.dtype)
        gh, gw = self.grid
        table = self.param(
            "rel_bias_table", nn.initializers.zeros,
            ((2 * gh - 1) * (2 * gw - 1) + 3, h),
        )
        idx = jnp.asarray(beit_relative_position_index(gh, gw))
        rel_bias = table[idx].transpose(2, 0, 1)  # (h, N, N) f32

        from skinjax.ops.pallas.global_attention import (
            attention_core, globattn_ok)

        # init often runs pinned to CPU (fast-init pattern) where a compiled
        # pallas_call cannot lower; the core is param-free, so the XLA
        # branch is init-safe. globattn_ok: bias path caps at N<=512
        # (ViT/BEiT N=197 is far inside; DESIGN §5m)
        if globattn_ok(N, has_bias=True) and not self.is_initializing():
            # fused core on the head-major channel layout — minor-axis
            # slices only, no (B, N, h, hd) relayout, no HBM score tensor
            # (measured beitv2_large B=32: 215.5 -> see DESIGN §5h)
            out = attention_core(
                qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:],
                rel_bias, None, None, h,
            )
            return nn.Dense(C, dtype=self.dtype, name="proj")(out)

        # minor-axis slices (timm unit order [q|k|v][h][hd]); avoids the 5-D
        # relayout copies the v5e trace showed for split+transpose
        q = qkv[..., :C].reshape(B, N, h, hd)
        k = qkv[..., C:2 * C].reshape(B, N, h, hd)
        v = qkv[..., 2 * C:].reshape(B, N, h, hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = attn + rel_bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out.reshape(B, N, C))


class BeitBlock(nn.Module):
    dim: int
    num_heads: int
    grid: Tuple[int, int]
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        g1 = self.param("gamma_1",
                        nn.initializers.constant(self.layerscale_init),
                        (self.dim,))
        g2 = self.param("gamma_2",
                        nn.initializers.constant(self.layerscale_init),
                        (self.dim,))
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = BeitAttention(self.dim, self.num_heads, self.grid,
                          dtype=self.dtype, name="attn")(y)
        x = x + g1.astype(y.dtype) * y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + g2.astype(y.dtype) * y


class _BeitScanBody(nn.Module):
    """One BeitBlock in (carry, _) -> (carry, None) form for ``nn.scan``."""

    dim: int
    num_heads: int
    grid: Tuple[int, int]
    layerscale_init: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, _):
        x = BeitBlock(self.dim, self.num_heads, self.grid,
                      layerscale_init=self.layerscale_init,
                      dtype=self.dtype, name="block")(x)
        return x, None


class Beit(nn.Module):
    """Returns fc_norm(mean over patch tokens) — the timm
    ``reset_classifier(0)`` output, shape (B, dim). ``tokens=True`` returns
    the full (B, N+1, dim) sequence (pre fc_norm) for sequence fusion.

    ``scan_blocks=True`` runs the 24 identical blocks under ``nn.scan`` —
    the block body traces/compiles ONCE instead of ``depth`` times (the
    compile-time lever for beitv2_large sweeps; same math). Params live
    stacked under ``blocks/block``; convert importer output with
    ``skinjax.models.backbones.vit.stack_block_params`` (the block{i} naming
    is shared)."""

    dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch: int = 16
    layerscale_init: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    scan_blocks: bool = False
    # sequence parallelism between blocks — see vit.ViT.seq_shard_axis
    seq_shard_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, tokens: bool = False,
                 capture: bool = False, feature_delta=None):
        """``capture``/``feature_delta``: CAM injection on the final
        (B, gh, gw, D) patch-token grid — BEiT mean-pools patch tokens
        (timm ``global_pool='avg'``), so the head reads the grid directly
        and jax.grad w.r.t. the delta is d(score)/d(grid) (xai/cam.py)."""
        B, H, W, _ = x.shape
        grid = (H // self.patch, W // self.patch)
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(B, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        if self.scan_blocks:
            body = nn.scan(
                _BeitScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
            )(
                self.dim, self.num_heads, grid,
                layerscale_init=self.layerscale_init, dtype=self.dtype,
                name="blocks",
            )
            x, _ = body(x, None)
        else:
            remat = _REMAT == "block" and train
            for i in range(self.depth):
                if self.seq_shard_axis is not None:
                    from skinjax.parallel.mesh import seq_shard

                    x = seq_shard(x, self.seq_shard_axis)
                if remat:
                    # function-form nn.remat (see resnet.py) — params are
                    # named inside, so the tree matches the plain path
                    def body(mdl, y, _i=i, _g=grid):
                        return BeitBlock(
                            mdl.dim, mdl.num_heads, _g,
                            layerscale_init=mdl.layerscale_init,
                            dtype=mdl.dtype, name=f"block{_i}")(y)

                    x = nn.remat(body, prevent_cse=False)(self, x)
                else:
                    x = BeitBlock(self.dim, self.num_heads, grid,
                                  layerscale_init=self.layerscale_init,
                                  dtype=self.dtype, name=f"block{i}")(x)
        if tokens:
            return x
        if capture or feature_delta is not None:
            gmap = x[:, 1:].reshape(B, *grid, self.dim)
            if feature_delta is not None:
                gmap = gmap + feature_delta.astype(gmap.dtype)
            pooled = gmap.reshape(B, -1, self.dim).mean(axis=1)
            pooled = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  name="fc_norm")(pooled)
            return (pooled, gmap) if capture else pooled
        pooled = x[:, 1:].mean(axis=1)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="fc_norm")(pooled)


beitv2_large = partial(Beit, dim=1024, depth=24, num_heads=16, patch=16)
beitv2_base = partial(Beit, dim=768, depth=12, num_heads=12, patch=16)
