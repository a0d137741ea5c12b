"""torch→flax importer parity: imported weights must reproduce torch outputs."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from skinjax.models.backbones.resnet import resnet18, resnet50
from skinjax.models.torch_import import import_resnet
from tests.torch_ref import TorchResNet


@pytest.mark.parametrize(
    "stages,block,ctor",
    [((2, 2, 2, 2), "basic", resnet18), ((2, 2, 2, 2), "bottleneck", None)],
)
def test_resnet_import_matches_torch(stages, block, ctor):
    torch.manual_seed(0)
    tm = TorchResNet(stage_sizes=stages, block=block, width=16)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    params, stats = import_resnet(sd, stages, block)
    from skinjax.models.backbones.resnet import ResNet

    fm = ResNet(stage_sizes=stages, block=block, width=16)
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_multimodal_checkpoint_import_runs():
    """End-to-end: synthesize a reference-shaped state_dict and load it."""
    from skinjax.models import MultimodalModel
    from skinjax.models.torch_import import import_multimodal_checkpoint
    from tests.torch_ref import TorchResNet

    torch.manual_seed(1)
    D, VOCAB, NCLS = 32, 11, 6
    enc = TorchResNet(stage_sizes=(2, 2, 2, 2), block="basic", width=64)
    sd = {f"image_encoder.{k}": v.detach().numpy() for k, v in enc.state_dict().items()}

    def lin(prefix, fin, fout):
        w = torch.randn(fout, fin) * 0.02
        sd[f"{prefix}.weight"] = w.numpy()
        sd[f"{prefix}.bias"] = torch.zeros(fout).numpy()

    def ln(prefix, f):
        sd[f"{prefix}.weight"] = np.ones(f, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(f, np.float32)

    def mha(prefix, d):
        sd[f"{prefix}.in_proj_weight"] = (torch.randn(3 * d, d) * 0.02).numpy()
        sd[f"{prefix}.in_proj_bias"] = np.zeros(3 * d, np.float32)
        sd[f"{prefix}.out_proj.weight"] = (torch.randn(d, d) * 0.02).numpy()
        sd[f"{prefix}.out_proj.bias"] = np.zeros(d, np.float32)

    lin("image_projector", 512, D)
    lin("text_fc.0", VOCAB, 256)
    lin("text_fc.2", 256, 512)
    lin("text_fc.4", 512, D)
    lin("text_projector", D, D)
    for n in ("image_self_attention", "text_self_attention",
              "image_cross_attention", "text_cross_attention"):
        mha(n, D)
    for n in ("img_gate", "txt_gate"):
        lin(n, D, D)
    for res in ("image_residual", "text_residual"):
        mha(f"{res}.attn", D)
        lin(f"{res}.gate_linear", D, D)
        ln(f"{res}.norm", D)
    lin("fc_fusion.0", 2 * D, D)
    ln("fc_fusion.1", D)
    lin("fc_fusion.4", D, D // 2)
    ln("fc_fusion.5", D // 2)
    lin("fc_fusion.8", D // 2, NCLS)
    lin("fc_visual_only", 512, NCLS)
    lin("fc_fusion_proj_feat2output", D, NCLS)

    from skinjax.models.torch_import import filter_to_template

    params, stats = import_multimodal_checkpoint(sd, common_dim=D, backbone="resnet-18")

    model = MultimodalModel(
        num_classes=NCLS, num_heads=4, cnn_model_name="resnet-18",
        common_dim=D, text_encoder_dim_output=D, vocab_size=VOCAB,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
    )
    # validate shapes against a fresh init tree, then run a forward
    x = jnp.zeros((1, 64, 64, 3))
    m = jnp.zeros((1, VOCAB))
    ref_vars = model.init(jax.random.key(0), x, m)
    params = filter_to_template(params, ref_vars["params"])
    ref_shapes = jax.tree_util.tree_map(lambda l: l.shape, ref_vars["params"])
    got_shapes = jax.tree_util.tree_map(lambda l: np.asarray(l).shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(got_shapes)
    assert jax.tree_util.tree_leaves(ref_shapes) == jax.tree_util.tree_leaves(got_shapes)

    out = model.apply({"params": params, "batch_stats": stats}, x, m)
    assert out.shape == (1, NCLS) and np.isfinite(np.asarray(out)).all()
