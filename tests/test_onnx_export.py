"""ONNX export parity: serialize the inference graph with the native
emitter (no onnx package), parse the BYTES back, execute with the numpy
evaluator, and compare logits against model.apply — the reference's
export contract (export_model_onnx.py:32-46: opset 13, image +
text_metadata inputs, logits output, dynamic batch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skinjax.models import MultimodalModel
from skinjax.serve.export import export_onnx
from skinjax.serve.onnx_proto import OnnxModel
from skinjax.serve.onnx_runtime import run_model

VOCAB = 12


def _model_and_vars(mech, backbone="custom-cnn", img=32):
    model = MultimodalModel(
        num_classes=4, num_heads=4, cnn_model_name=backbone, common_dim=32,
        text_encoder_dim_output=32, vocab_size=VOCAB,
        attention_mechanism=mech,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, img, img, 3)), jnp.zeros((1, VOCAB))
    )
    return model, variables


@pytest.mark.parametrize("mech", [
    "concatenation", "metablock", "crossattention",
    "att-intramodal+residual+cross-attention-metadados",
])
def test_onnx_bytes_match_apply(tmp_path, mech):
    model, variables = _model_and_vars(mech)
    path = str(tmp_path / "model.onnx")
    data = export_onnx(model, variables, path, image_size=(32, 32),
                       vocab_size=VOCAB)
    assert open(path, "rb").read() == data

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    meta = rng.normal(size=(3, VOCAB)).astype(np.float32)
    ref = np.asarray(model.apply(variables, jnp.asarray(img),
                                 jnp.asarray(meta)), np.float32)
    out = run_model(data, {"image": img, "text_metadata": meta})
    np.testing.assert_allclose(out["logits"], ref, atol=2e-4, rtol=2e-4)


def test_onnx_resnet_backbone_parity(tmp_path):
    """Conv/BN/maxpool path: resnet-18 backbone through the full exporter."""
    model, variables = _model_and_vars("concatenation", backbone="resnet-18",
                                       img=64)
    data = export_onnx(model, variables, str(tmp_path / "m.onnx"),
                       image_size=(64, 64), vocab_size=VOCAB)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    meta = rng.normal(size=(2, VOCAB)).astype(np.float32)
    ref = np.asarray(model.apply(variables, jnp.asarray(img),
                                 jnp.asarray(meta)), np.float32)
    out = run_model(data, {"image": img, "text_metadata": meta})
    np.testing.assert_allclose(out["logits"], ref, atol=5e-4, rtol=5e-4)


def test_onnx_model_structure():
    """The reference contract: opset 13, named inputs with a dynamic batch
    dim, logits output (export_model_onnx.py:32-46)."""
    model, variables = _model_and_vars("concatenation")
    data = export_onnx(model, variables, None, image_size=(32, 32),
                       vocab_size=VOCAB)
    m = OnnxModel(data)
    assert m.opset == 13
    assert [i["name"] for i in m.inputs] == ["image", "text_metadata"]
    assert m.inputs[0]["shape"][0] == "batch"  # dynamic batch dim
    assert m.inputs[0]["shape"][1:] == [32, 32, 3]
    assert [o["name"] for o in m.outputs] == ["logits"]
    assert m.producer == "skinjax"
    assert len(m.initializers) > 10  # weights embedded
