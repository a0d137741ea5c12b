"""skinjax quickstart: train, evaluate, explain, and serve — end to end.

Runs on the synthetic fixture so it needs no data; swap in
``prepare_dataset`` + ``ImageStore`` for a real dataset (see README).

    JAX_PLATFORMS=cpu python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from skinjax.data import synthetic_source
from skinjax.models import MultimodalModel
from skinjax.serve.engine import InferenceEngine
from skinjax.train import TrainConfig, train_process
from skinjax.train.kfold import SubsetSource
from skinjax.xai import grad_cam_pp


def main():
    # 1) data ---------------------------------------------------------------
    src = synthetic_source(n=96, image_size=(64, 64), feature_dim=16,
                           num_classes=4)
    train = SubsetSource(src, np.arange(72))
    val = SubsetSource(src, np.arange(72, 96))

    # 2) model + training ----------------------------------------------------
    model = MultimodalModel(
        num_classes=4, num_heads=4, cnn_model_name="resnet-18", common_dim=64,
        text_encoder_dim_output=64, vocab_size=16,
        attention_mechanism="att-intramodal+residual+cross-attention-metadados",
    )
    state, metrics, history = train_process(
        model, train, val, num_classes=4,
        config=TrainConfig(num_epochs=3, batch_size=24, learning_rate=1e-3,
                           image_dtype="float32"),
    )
    print("val metrics:", {k: round(v, 4) for k, v in metrics.items()
                           if isinstance(v, float)})

    # 3) explain ---------------------------------------------------------------
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = val.batch(np.arange(2))
    img = jnp.asarray(batch["image"], jnp.float32) / 255.0
    cam = grad_cam_pp(
        model, variables, img, jnp.asarray(batch["metadata"]),
        jnp.asarray(batch["label"]),
    )
    print("grad-cam++ maps:", cam.shape)

    # 4) serve -----------------------------------------------------------------
    engine = InferenceEngine(model, variables, use_fused=True)
    probs = engine.predict_probs(
        np.asarray(img, np.float32), batch["metadata"]
    )
    print("served probs:", np.round(probs, 3))


if __name__ == "__main__":
    main()
