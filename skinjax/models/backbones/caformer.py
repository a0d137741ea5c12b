"""CAFormer — timm ``metaformer.py`` layout (Flax, NHWC).

``caformer_s18``/``caformer_b36`` are swept by the reference's generic timm
loader (loadImageModelClassifier.py:115-150; caformer_b36 BACC 0.8062 in the
published table). The MetaFormer-baselines specifics that the previous
paper-style sketch missed and this module reproduces exactly:

- StarReLU activations (``s·relu(x)² + b`` with learnable scalars) in both
  the SepConv mixer and the MLPs,
- bias-free projections everywhere (qkv/proj/mlp/pwconv) and bias-free
  LayerNorms (eps 1e-6) for block norms and downsample pre-norms,
- residual scaling (``res_scale``) on the identity branch of stages 3/4,
- stem conv 7×7/4 pad 2; downsampling = pre-norm → conv 3×3/2 pad 1,
- head: global-avg-pool → LayerNorm (with bias) — what
  ``reset_classifier(0)`` keeps.

TPU notes: NHWC; 1×1 convs are Dense layers (pure MXU matmuls); the
depthwise 7×7 stays a grouped conv XLA maps to the vector unit; attention
(stages 3/4, 14²/7² tokens) runs one batched MHA with fp32 logits.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class StarReLU(nn.Module):
    """s * relu(x)^2 + b, learnable scalars (MetaFormer baselines §3)."""

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.ones, (1,))
        b = self.param("bias", nn.initializers.zeros, (1,))
        r = nn.relu(x)
        return s.astype(x.dtype) * r * r + b.astype(x.dtype)


def _ln_nb(dtype, name):
    return nn.LayerNorm(epsilon=1e-6, use_bias=False, dtype=dtype, name=name)


class SepConvMixer(nn.Module):
    """pwconv1 → StarReLU → dw 7×7 → pwconv2, all bias-free."""

    dim: int
    expansion: float = 2.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        mid = int(self.dim * self.expansion)
        y = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="pwconv1")(x)
        y = StarReLU(name="act1")(y)
        y = nn.Conv(mid, (7, 7), padding=[(3, 3)] * 2, feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="dwconv")(y)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="pwconv2")(y)


class MetaFormerAttention(nn.Module):
    """Global MHA, head_dim=32, bias-free qkv/proj (timm metaformer)."""

    dim: int
    head_dim: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = max(1, C // self.head_dim)
        hd = self.head_dim
        att_dim = h * hd
        t = x.reshape(B, H * W, C)
        qkv = nn.Dense(3 * att_dim, use_bias=False, dtype=self.dtype,
                       name="qkv")(t)

        from skinjax.ops.pallas.global_attention import (
            attention_core, globattn_ok)

        # The fused global core is OPT-IN here (SKINJAX_CAFORMER_ATTN=
        # pallas), NOT the TPU default: routing these blocks through the
        # kernel inside the full caformer_b36 train program crashes the
        # remote TPU compile helper (HTTP 500, both attempts — measured
        # refutation, DESIGN §5n; the same shapes pass parity in
        # interpret mode, test_global_attention.py:336). The XLA einsum
        # path measures 410-414.5 img/s B=32 and stays the default.
        # is_initializing: CPU fast-init can't lower pallas.
        import os as _os
        if (_os.environ.get("SKINJAX_CAFORMER_ATTN", "") == "pallas"
                and globattn_ok(H * W) and not self.is_initializing()):
            out = attention_core(
                qkv[..., :att_dim], qkv[..., att_dim:2 * att_dim],
                qkv[..., 2 * att_dim:], None, None, None, h)
        else:
            # minor-axis slices (timm unit order [q|k|v][h][hd]); avoids
            # the 5-D relayout copies the v5e trace showed
            q = qkv[..., :att_dim].reshape(B, -1, h, hd)
            k = qkv[..., att_dim:2 * att_dim].reshape(B, -1, h, hd)
            v = qkv[..., 2 * att_dim:].reshape(B, -1, h, hd)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd ** -0.5), k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(t.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(B, H * W, att_dim)
        out = nn.Dense(C, use_bias=False, dtype=self.dtype, name="proj")(out)
        return out.reshape(B, H, W, C)


class _KernelParam(nn.Module):
    """Bias-free Dense-shaped kernel holder — same tree/init as
    ``nn.Dense(use_bias=False)`` so checkpoints/importer stay layout-
    identical while the caller routes compute through the fused MLP kernel
    (ops/pallas/fused_mlp.py) or the XLA chain."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_dim, self.features))


class _StarParams(nn.Module):
    """StarReLU's learnable scalars under the same names as StarReLU."""

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (1,)),
                self.param("bias", nn.initializers.zeros, (1,)))


def caformer_mlp_mode() -> str:
    """SKINJAX_CAFORMER_MLP: '' = XLA chain (default), 'fused' = Pallas
    fused fc1->StarReLU->fc2 on blocks whose bf16 hidden intermediate is
    >=48 MB, 'all' = every block. Export tracing always ''."""
    import os as _os
    if _os.environ.get("SKINJAX_EXPORT_COMPAT", "") == "1":
        return ""
    return _os.environ.get("SKINJAX_CAFORMER_MLP", "")


_FUSED_MLP_MIN_BYTES = 48 * 1024 * 1024


class MetaFormerMlp(nn.Module):
    dim: int
    ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from flax.linen import dtypes as _dtypes

        hid = int(self.dim * self.ratio)
        w1 = _KernelParam(self.dim, hid, name="fc1")()
        s, b = _StarParams(name="act")()
        w2 = _KernelParam(hid, self.dim, name="fc2")()
        mode = caformer_mlp_mode()
        tokens = 1
        for d in x.shape[:-1]:
            tokens *= d
        inter_bytes = tokens * hid * x.dtype.itemsize
        fuse = (not self.is_initializing()
                and (mode == "all"
                     or (mode == "fused"
                         and inter_bytes >= _FUSED_MLP_MIN_BYTES)))
        if fuse:
            # fused fc1->StarReLU->fc2 (ops/pallas/fused_mlp.mlp_star): the
            # (tokens, hid) hidden plane stays in VMEM per token tile; the
            # backward recomputes it instead of saving it to HBM
            from skinjax.ops.pallas.fused_mlp import mlp_star
            xc, k1, k2 = _dtypes.promote_dtype(x, w1, w2, dtype=self.dtype)
            return mlp_star(xc, k1, s, b, k2)
        xc, k1 = _dtypes.promote_dtype(x, w1, dtype=self.dtype)
        y = jnp.dot(xc, k1)
        r = nn.relu(y)
        y = s.astype(y.dtype) * r * r + b.astype(y.dtype)
        yc, k2 = _dtypes.promote_dtype(y, w2, dtype=self.dtype)
        return jnp.dot(yc, k2)


class MetaFormerBlock(nn.Module):
    dim: int
    mixer: str  # "conv" | "attention"
    res_scale: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        def rs(name):
            if not self.res_scale:
                return None
            return self.param(name, nn.initializers.ones, (self.dim,))

        y = _ln_nb(self.dtype, "norm1")(x)
        if self.mixer == "conv":
            y = SepConvMixer(self.dim, dtype=self.dtype, name="token_mixer")(y)
        else:
            y = MetaFormerAttention(self.dim, dtype=self.dtype,
                                    name="token_mixer")(y)
        r1 = rs("res_scale1")
        x = (x * r1.astype(x.dtype) if r1 is not None else x) + y
        y = _ln_nb(self.dtype, "norm2")(x)
        y = MetaFormerMlp(self.dim, dtype=self.dtype, name="mlp")(y)
        r2 = rs("res_scale2")
        return (x * r2.astype(x.dtype) if r2 is not None else x) + y


class CAFormer(nn.Module):
    """timm caformer topology: [SepConv, SepConv, Attention, Attention]
    mixers, res_scale on stages 3/4. Returns the ``reset_classifier(0)``
    output — head-LayerNorm(global-avg-pool), (B, dims[-1]) — by default;
    ``features=True`` returns the final NHWC map."""

    dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 3, 9, 3)
    mixers: Sequence[str] = ("conv", "conv", "attention", "attention")
    res_scale_stages: Sequence[bool] = (False, False, True, True)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, features: bool = False,
                 feature_delta=None, capture: bool = False):
        x = nn.Conv(self.dims[0], (7, 7), strides=(4, 4), padding=[(2, 2)] * 2,
                    dtype=self.dtype, name="stem_conv")(x)
        x = _ln_nb(self.dtype, "stem_norm")(x)
        for si, (dim, depth, mixer, rs) in enumerate(
            zip(self.dims, self.depths, self.mixers, self.res_scale_stages)
        ):
            if si > 0:
                x = _ln_nb(self.dtype, f"down{si}_norm")(x)
                x = nn.Conv(dim, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name=f"down{si}_conv")(x)
            for bi in range(depth):
                x = MetaFormerBlock(dim, mixer, res_scale=rs, dtype=self.dtype,
                                    name=f"stage{si}_block{bi}")(x)
        if feature_delta is not None:  # CAM support — see davit.py
            x = x + feature_delta
        fmap = x
        if features:
            return x
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_norm")(x)
        return (x, fmap) if capture else x


caformer_s18 = partial(CAFormer, dims=(64, 128, 320, 512), depths=(3, 3, 9, 3))
caformer_b36 = partial(CAFormer, dims=(128, 256, 512, 768), depths=(3, 12, 18, 3))
