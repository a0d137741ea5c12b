"""Device mesh construction + sharding rules (dp × tp).

The reference is single-GPU (SURVEY.md §2: no DDP/NCCL anywhere); this module
is the TPU-native scaling design that replaces it:

  * a 2-D ``Mesh`` with axes ``("data", "model")`` — batches shard over
    ``data`` (pure DP), wide Dense kernels shard over ``model`` (TP for the
    4096-d VGG/LiwTERM heads and the fusion MLPs);
  * parameters get ``NamedSharding`` annotations and the train step is
    ``jit``-ed over the mesh — XLA GSPMD inserts the ``psum`` /
    ``all_gather`` / ``reduce_scatter`` collectives so gradients ride ICI;
  * fold-level parallelism (5 CV folds × sweep grid is embarrassingly
    parallel) runs as independent processes/slices on top of this.

No NCCL-style transport is built because on TPU the compiler IS the
communication layer (scaling-book recipe: pick mesh → annotate → let XLA
insert collectives).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults to all devices on the data
    axis (the right default for this model family: batch-dominant CNNs)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    if n_data * n_model != devices.size:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {devices.size} devices available"
        )
    return Mesh(devices.reshape(n_data, n_model), axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


# Megatron-style column/row-parallel pairs for transformer blocks, keyed on
# the param path tail (module naming is uniform across the timm-layout
# backbones: attention qkv/proj, MLP fc1/fc2). Column-parallel layers shard
# the OUTPUT dim (and their bias); the row-parallel partner shards the INPUT
# dim so the pair needs exactly one psum between them (GSPMD inserts it).
_ATTN_COL = (
    "attn/qkv/kernel", "mlp/fc1/kernel",
    # native BERT (models/text/bert.py, HF-identical tree): separate
    # q/k/v projections + MLP intermediate are column-parallel
    "attention/self/query/kernel", "attention/self/key/kernel",
    "attention/self/value/kernel", "intermediate/dense/kernel",
)
_ATTN_COL_BIAS = (
    "attn/qkv/bias", "mlp/fc1/bias",
    "attention/self/query/bias", "attention/self/key/bias",
    "attention/self/value/bias", "intermediate/dense/bias",
)
# "output/dense/kernel" covers BOTH BERT row-parallel partners: the
# attention output projection (attention/output/dense) and the MLP output
# (output/dense) — each consumes a column-sharded activation, so the pair
# closes with one psum exactly like attn/proj + mlp/fc2.
_ATTN_ROW = ("attn/proj/kernel", "mlp/fc2/kernel", "output/dense/kernel")
# native GPT-2 (models/text/gpt2.py, HF-identical tree): Conv1D kernels are
# stored TRANSPOSED, (out, in) — FlaxConv1D layout — so the Megatron column
# split lands on dim 0 and the row split on dim 1. The fused c_attn output
# is a feature-dim split like qkv (GSPMD reshards non-aligned divisors).
_CONV1D_COL = ("attn/c_attn/kernel", "mlp/c_fc/kernel")
_CONV1D_COL_BIAS = ("attn/c_attn/bias", "mlp/c_fc/bias")
_CONV1D_ROW = ("attn/c_proj/kernel", "mlp/c_proj/kernel")
# depthwise position-encoding convs (DaViT ConvPosEnc): channel-parallel by
# nature — sharding them over cout keeps the activations channel-sharded
# through the block. Leaving them replicated amid model-sharded activations
# trips a GSPMD grouped-conv backward miscount (observed: exactly-2x weight
# grads on a 2-way model axis).
_ATTN_DW = ("cpe1/proj/kernel", "cpe2/proj/kernel")


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def param_sharding_rules(
    mesh: Mesh, params, min_tp_dim: int = 1024, min_tp_conv: int = 0,
    tp_attn: bool = False,
):
    """Assign a NamedSharding to every param leaf.

    Policy: replicate by default; tensor-parallel-shard 2-D kernels whose
    output dim is both >= min_tp_dim and divisible by the model-axis size
    (covers the 4096-wide VGG16/LiwTERM heads, ViT MLPs, and the fusion MLP
    stack at large common_dim).

    ``min_tp_conv`` > 0 additionally shards 4-D conv kernels (kh, kw, cin,
    cout) over their output-channel dim when cout >= min_tp_conv and cout
    divides by the model-axis size — channel TP for the CNN backbone itself.
    GSPMD then propagates the channel sharding to the activations, so BN
    statistic reductions stay local to each model shard and the cross-shard
    collectives ride the convolutions' cin contractions. 0 (default)
    replicates convs — the right default when activations dominate (224²
    inputs, small models) and DP alone saturates.

    ``tp_attn`` additionally applies Megatron column/row-parallel pairs to
    transformer attention/MLP kernels by path (``attn/qkv`` + ``mlp/fc1``
    output-split, ``attn/proj`` + ``mlp/fc2`` input-split) regardless of
    ``min_tp_dim`` — the model axis then splits every block of the
    davit/swin/vit families, with one activation psum per pair. The fused
    qkv output dim is a feature-dim split ([q|k|v][h][hd] unit order): for
    n_model not dividing each of q/k/v's head blocks GSPMD inserts the
    resharding collectives, so numerics stay exact for any divisor.
    """
    n_model = mesh.shape["model"]

    def rule(path, leaf):
        if n_model > 1 and hasattr(leaf, "ndim"):
            p = _path_str(path) if tp_attn else ""
            if tp_attn and leaf.ndim == 2:
                if (p.endswith(_ATTN_COL)
                        and leaf.shape[1] % n_model == 0):
                    return NamedSharding(mesh, P(None, "model"))
                if (p.endswith(_ATTN_ROW)
                        and leaf.shape[0] % n_model == 0):
                    return NamedSharding(mesh, P("model", None))
                if (p.endswith(_CONV1D_COL)
                        and leaf.shape[0] % n_model == 0):
                    return NamedSharding(mesh, P("model", None))
                if (p.endswith(_CONV1D_ROW)
                        and leaf.shape[1] % n_model == 0):
                    return NamedSharding(mesh, P(None, "model"))
            if (tp_attn and leaf.ndim == 1
                    and p.endswith(_ATTN_COL_BIAS + _CONV1D_COL_BIAS)
                    and leaf.shape[0] % n_model == 0):
                return NamedSharding(mesh, P("model"))
            if (tp_attn and leaf.ndim == 4
                    and p.endswith(_ATTN_DW)
                    and leaf.shape[3] % n_model == 0):
                return NamedSharding(mesh, P(None, None, None, "model"))
            if leaf.ndim == 2:
                in_dim, out_dim = leaf.shape
                if out_dim >= min_tp_dim and out_dim % n_model == 0:
                    return NamedSharding(mesh, P(None, "model"))
                if in_dim >= min_tp_dim and in_dim % n_model == 0:
                    return NamedSharding(mesh, P("model", None))
            if min_tp_conv and leaf.ndim == 4:
                cout = leaf.shape[3]
                if cout >= min_tp_conv and cout % n_model == 0:
                    return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(mesh: Mesh, params, min_tp_dim: int = 1024, min_tp_conv: int = 0,
                 tp_attn: bool = False):
    """Device-put params according to param_sharding_rules."""
    shardings = param_sharding_rules(mesh, params, min_tp_dim, min_tp_conv,
                                     tp_attn)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def seq_shard(x, axis: Optional[str], dim: int = 1):
    """Megatron-style sequence parallelism as a GSPMD constraint.

    Pins activation axis ``dim`` (the token axis of a (B, T, D) stream) to
    mesh axis ``axis`` while leaving every other dim UNCONSTRAINED (so batch
    sharding over ``data`` propagates untouched). Placed on the residual
    stream between transformer blocks, the partitioner keeps the
    LayerNorm/residual/elementwise regions token-sharded — their activation
    footprint and flops divide by the axis size — and inserts exactly the
    Megatron-SP collectives (all-gather entering attention/MLP when their
    kernels are TP-sharded, reduce-scatter back) itself. No-op when ``axis``
    is None or there is no ambient mesh carrying it (init/eval_shape and
    single-device paths stay valid)."""
    if axis is None:
        return x
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty or axis not in am.axis_names:
        return x
    spec = [P.UNCONSTRAINED] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, P(*spec))


def fsdp_sharding_rules(
    mesh: Mesh, params, axis: str = "data", min_size: int = 2 ** 16,
    base_rules=None,
):
    """ZeRO-3-style fully-sharded data parallelism as a sharding rule tree.

    Each parameter leaf with ``size >= min_size`` is sharded over ``axis``
    along its largest dimension divisible by the axis size; everything else
    (and every leaf ``base_rules`` already puts on another mesh axis) is left
    alone. Because the rule is shape-only it applies unchanged to the Adam
    moments mirroring the params, so optimizer state is sharded too — the
    full ZeRO-3 memory split. GSPMD then compiles the train step into
    all-gather(param)-before-use + reduce-scatter(grad) + a fully sharded
    optimizer update: no hand-written collectives, exactly the scaling-book
    FSDP recipe. Needed for the largest backbone in the reference's published
    table (beitv2_large_patch16_224, 307 M params —
    /root/reference/src/scripts/others/frugality_bacc_by_models.py:14-16):
    params + Adam moments in fp32 are ~3.7 GB replicated, ~0.46 GB/device
    sharded 8-way.

    ``base_rules`` (a matching tree of NamedSharding, e.g. from
    param_sharding_rules) composes TP with FSDP: leaves the TP rule already
    shards keep their spec; FSDP fills in the replicated remainder.
    """
    n = mesh.shape[axis]
    flat_base = None
    if base_rules is not None:
        flat_base = jax.tree_util.tree_leaves(base_rules)

    def rule(i, leaf):
        if flat_base is not None:
            base = flat_base[i]
            if any(base.spec):
                return base
        shape = getattr(leaf, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if n > 1 and size >= min_size:
            order = sorted(range(len(shape)), key=lambda d: -shape[d])
            for d in order:
                if shape[d] % n == 0:
                    spec = [None] * len(shape)
                    spec[d] = axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    leaves, treedef = jax.tree_util.tree_flatten(params)
    return jax.tree_util.tree_unflatten(
        treedef, [rule(i, l) for i, l in enumerate(leaves)]
    )
