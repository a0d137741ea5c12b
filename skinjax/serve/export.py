"""Model export (the reference's ONNX path, others/export_model_onnx.py:32-46).

Three formats:
  * ``export_onnx``: native opset-13 ONNX emission (jaxpr → ONNX via
    serve/onnx_export.py; no onnx package needed) with the reference's
    exact contract — ``image``/``text_metadata`` inputs, ``logits`` output,
    dynamic batch. Tested by executing the serialized bytes with the numpy
    evaluator (serve/onnx_runtime.py) against model.apply logits.
  * ``export_saved_model``: jax2tf → TF SavedModel with dynamic batch — the
    TPU-world equivalent of the reference's opset-13 ONNX export (tensorflow
    is in the image; onnx is not). Inputs keep the reference's names
    (``image``, ``text_metadata``).
  * ``export_stablehlo``: jax.export → serialized StableHLO bytes — the
    runtime-independent exchange format native to the XLA ecosystem.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _forward_fn(model, variables):
    def forward(image, text_metadata):
        return model.apply(variables, image, text_metadata).astype(jnp.float32)

    return forward


def export_saved_model(
    model, variables, path: str, image_size=(224, 224), vocab_size: int = 91
) -> str:
    from jax.experimental import jax2tf
    import tensorflow as tf

    forward = _forward_fn(model, variables)
    tf_fn = tf.function(
        jax2tf.convert(forward, polymorphic_shapes=["(b, ...)", "(b, ...)"]),
        autograph=False,
        input_signature=[
            tf.TensorSpec([None, *image_size, 3], tf.float32, name="image"),
            tf.TensorSpec([None, vocab_size], tf.float32, name="text_metadata"),
        ],
    )
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(module, path, signatures={"serving_default": tf_fn})
    return path


def export_stablehlo(
    model, variables, path: str, batch: int = 1, image_size=(224, 224),
    vocab_size: int = 91,
) -> str:
    from jax import export as jax_export

    forward = _forward_fn(model, variables)
    exported = jax_export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct((batch, *image_size, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, vocab_size), jnp.float32),
    )
    data = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_stablehlo(path: str):
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def export_onnx(
    model, variables, path: str, image_size=(224, 224), vocab_size: int = 91
) -> bytes:
    """Serialize the inference graph as ONNX opset 13 — the reference's
    export contract (export_model_onnx.py:32-46). Weights are exported f32
    (cast from bf16 if the model trained in bf16)."""
    from skinjax.serve.onnx_export import export_onnx as _export

    f32_vars = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a,
        variables,
    )
    fwd = _forward_fn(model, f32_vars)
    example = (
        np.zeros((1, *image_size, 3), np.float32),
        np.zeros((1, vocab_size), np.float32),
    )
    return _export(fwd, example, path=path,
                   input_names=("image", "text_metadata"),
                   output_names=("logits",), dynamic_batch=True)
