"""MViTv2 — timm ``mvitv2.py`` layout (Flax).

``mvitv2_small`` is the #2 backbone in the reference's published BACC table
(0.8137, frugality_bacc_by_models.py:5-17) and loads through the generic
timm path (loadImageModelClassifier.py:115-150). The pieces the previous
sketch omitted and this module implements exactly:

- fused qkv that EXPANDS dim at the first block of each stage
  (``expand_attn``: qkv maps dim_in → 3·dim_out),
- per-head depthwise conv pooling of q/k/v (kernel 3, stride_q 2 at stage
  transitions, adaptive stride_kv 4→2→1→1) each followed by a LayerNorm on
  head_dim,
- decomposed relative position embeddings ``rel_pos_h``/``rel_pos_w``
  einsum-added to the attention logits,
- residual pooling (``x = attn@v + q``),
- the shortcut path: Linear projection of the *normed* input when dim
  expands, max-pool 3/2/1 when q is strided,
- final LayerNorm on tokens, then mean-pool — the ``reset_classifier(0)``
  output.

TPU notes: tokens stay (B, N, C) with feat sizes tracked statically in
Python (every block's shapes are compile-time constants); the rel-pos gather
is a static-index table lookup folded at trace time; pooling convs run as
grouped NHWC convs; attention logits accumulate fp32.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _rel_pos_dists(q_size: int, k_size: int) -> np.ndarray:
    """timm cal_rel_pos_type distance map (q_size, k_size) -> table index."""
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    dist = (np.arange(q_size)[:, None] * q_ratio
            - np.arange(k_size)[None, :] * k_ratio)
    dist += (k_size - 1) * k_ratio
    return dist.astype(np.int64)


class MViTAttention(nn.Module):
    """MultiScaleAttention, mode='conv', pool_first=False."""

    dim_out: int
    num_heads: int
    stride_q: int
    stride_kv: int
    feat: Tuple[int, int]  # input feature size (H, W)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        h = self.num_heads
        hd = self.dim_out // h
        H, W = self.feat
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        d = self.dim_out
        # minor-axis slices (timm unit order [q|k|v][h][hd]) — avoids the 5-D
        # relayout copies the v5e trace showed for reshape(…,3,h,hd) splits
        q, k, v = (
            qkv[..., i * d:(i + 1) * d].reshape(B, N, h, hd) for i in range(3)
        )  # (B, N, h, hd)

        def pool(t, stride, cname, nname):
            # (B, N, h, hd) -> per-head dw conv 3x3 -> (B, N', h, hd), N'=(H/s)^2
            m = t.transpose(0, 2, 1, 3).reshape(B * h, H, W, hd)
            m = nn.Conv(hd, (3, 3), strides=(stride, stride),
                        padding=[(1, 1)] * 2, feature_group_count=hd,
                        use_bias=False, dtype=self.dtype, name=cname)(m)
            Hs, Ws = m.shape[1:3]
            m = m.reshape(B, h, Hs * Ws, hd)
            m = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=nname)(m)
            return m, (Hs, Ws)

        q, q_size = pool(q, self.stride_q, "pool_q", "norm_q")
        k, k_size = pool(k, self.stride_kv, "pool_k", "norm_k")
        v, _ = pool(v, self.stride_kv, "pool_v", "norm_v")

        # decomposed relative position embeddings (static index maps)
        rel_dim = 2 * max(q_size[0], k_size[0]) - 1
        rel_h = self.param("rel_pos_h", nn.initializers.zeros, (rel_dim, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros, (rel_dim, hd))
        Rh = rel_h[jnp.asarray(_rel_pos_dists(q_size[0], k_size[0]))]
        Rw = rel_w[jnp.asarray(_rel_pos_dists(q_size[1], k_size[1]))]
        r_q = q.reshape(B, h, q_size[0], q_size[1], hd)
        bias_h = jnp.einsum("byhwc,hkc->byhwk", r_q, Rh.astype(q.dtype))
        bias_w = jnp.einsum("byhwc,wkc->byhwk", r_q, Rw.astype(q.dtype))

        from skinjax.ops.pallas.global_attention import globattn_mode
        Nq = q_size[0] * q_size[1]
        Nk = k_size[0] * k_size[1]
        # SKINJAX_POOLED_ATTN scopes which blocks fuse:
        # - "chunked" (default): every block fused, 16/16 — large
        #   cross-shaped blocks (stage-0's 3136x196) go through QUERY-CHUNK
        #   folding (pooled_attention_chunked: Nq split into grid cells of
        #   <=1024 rows; exact, softmax is per-row). Measured same-run
        #   (bench/ab_mvit_chunked.py, DESIGN §5l-b): 540.7-541.7 img/s vs
        #   auto's 507.7 (+6.5%), and the §5l single-cell helper crash
        #   does NOT reproduce with the folded grid.
        # - "auto": every block EXCEPT the stage-0 transition — including
        #   that one kernel SINGLE-CELL in the full-model program
        #   deterministically crashes the remote TPU compile helper at
        #   B>=32 (no Mosaic diagnostic; bisected in DESIGN §5l),
        # - "equal": equal-length body blocks only,
        # - "all": everything single-cell (the §5l helper-crash repro),
        # - "": disabled.
        import os as _os

        from skinjax.ops.pallas.pooled_attention import (
            pooled_attn_ok, query_chunks)
        scope = _os.environ.get("SKINJAX_POOLED_ATTN", "chunked")
        # capacity gate (ADVICE r4, low): the equal-length case is capped
        # too — per-cell f32 P block must fit VMEM and the stored-P
        # residual must stay under the per-layer ceiling, else fall back
        # to XLA (which handles any size) instead of crashing Mosaic.
        cap_ok = pooled_attn_ok(B, h, Nq, Nk)
        chunks = (query_chunks(Nq) or 1) if Nq != Nk else 1
        chunk_ok = (query_chunks(Nq) is not None
                    and pooled_attn_ok(B, h * chunks, Nq // chunks, Nk))
        scoped = {"auto": (Nq == Nk or Nq <= 1024) and cap_ok,
                  "chunked": ((Nq == Nk or Nq <= 1024) and cap_ok)
                             or chunk_ok,
                  "equal": Nq == Nk and cap_ok,
                  "all": True}.get(scope, False)
        if scope != "chunked" or Nq <= 1024 or Nq == Nk:
            chunks = 1
        fuse = (globattn_mode() == "pallas" and not self.is_initializing()
                and scoped)
        if fuse:
            # fused pooled-attention core: scores -> decomposed-bias add
            # (expanded IN-KERNEL, never materialized as (B,h,Nq,Nk) or the
            # 6-D f32 broadcast the XLA form lowers to) -> softmax -> p@v,
            # all VMEM-resident per (b,h) cell; stored-P backward
            # (ops/pallas/pooled_attention.py, DESIGN §5l)
            from skinjax.ops.pallas.pooled_attention import (
                pooled_attention_chunked)

            out = pooled_attention_chunked(
                q, k, v,
                bias_h.reshape(B, h, Nq, k_size[0]),
                bias_w.reshape(B, h, Nq, k_size[1]),
                (int(k_size[0]), int(k_size[1])),
                chunks,
            )
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                              preferred_element_type=jnp.float32)
            attn = attn.reshape(B, h, *q_size, *k_size)
            attn = attn + bias_h[..., :, None].astype(attn.dtype) \
                        + bias_w[..., None, :].astype(attn.dtype)
            attn = attn.reshape(B, h, Nq, k_size[0] * k_size[1])
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out + q  # residual pooling
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out), q_size


class MViTBlock(nn.Module):
    dim_in: int
    dim_out: int
    num_heads: int
    stride_q: int
    stride_kv: int
    feat: Tuple[int, int]
    mlp_ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        H, W = self.feat
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.dim_in != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype,
                                name="shortcut_proj")(y)
        else:
            shortcut = x
        if self.stride_q > 1:
            m = shortcut.reshape(B, H, W, self.dim_out)
            m = nn.max_pool(m, (3, 3), strides=(self.stride_q,) * 2,
                            padding=[(1, 1)] * 2)
            shortcut = m.reshape(B, -1, self.dim_out)
        y, q_size = MViTAttention(
            self.dim_out, self.num_heads, self.stride_q, self.stride_kv,
            self.feat, dtype=self.dtype, name="attn",
        )(y)
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y, q_size


class MViTv2(nn.Module):
    """timm mvitv2 topology (expand_attn, conv pooling, spatial rel-pos,
    residual pooling). Returns mean-pooled normed tokens (B, dims[-1])."""

    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (1, 2, 11, 2)
    heads: Sequence[int] = (1, 2, 4, 8)
    stride_kv_adaptive: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, tokens: bool = False,
                 capture: bool = False, feature_delta=None):
        """``capture``/``feature_delta``: CAM injection on the final normed
        (B, h, w, D) token grid — MViTv2 mean-pools all tokens (no CLS), so
        the head reads the grid directly (xai/cam.py)."""
        B = x.shape[0]
        x = nn.Conv(self.dims[0], (7, 7), strides=(4, 4), padding=[(3, 3)] * 2,
                    dtype=self.dtype, name="patch_embed")(x)
        feat = x.shape[1:3]
        x = x.reshape(B, -1, self.dims[0])
        dim_in = self.dims[0]
        kv_stride = self.stride_kv_adaptive
        for si, (dim, depth, h) in enumerate(zip(self.dims, self.depths,
                                                 self.heads)):
            stage_stride_q = 2 if si > 0 else 1
            if stage_stride_q > 1:
                kv_stride = max(kv_stride // stage_stride_q, 1)
            for bi in range(depth):
                sq = stage_stride_q if bi == 0 else 1
                x, feat = MViTBlock(
                    dim_in, dim, h, sq, kv_stride, feat, dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x)
                dim_in = dim
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if tokens:
            return x.reshape(B, *feat, dim_in)
        if capture or feature_delta is not None:
            gmap = x.reshape(B, *feat, dim_in)
            if feature_delta is not None:
                gmap = gmap + feature_delta.astype(gmap.dtype)
            pooled = gmap.reshape(B, -1, dim_in).mean(axis=1)
            return (pooled, gmap) if capture else pooled
        return x.mean(axis=1)


mvitv2_tiny = partial(MViTv2, depths=(1, 2, 5, 2))
mvitv2_small = partial(MViTv2, depths=(1, 2, 11, 2))
