"""Service entry point — env-configured model load + HTTP serve
(the reference's api.py:28-44 startup contract: MODEL/featurizer paths and
architecture knobs from environment variables).

  MODEL_CHECKPOINT     orbax params dir (optional; random init without it)
  FEATURIZER_JSON      persisted featurizer (required for raw-CSV inputs)
  CNN_MODEL_NAME, ATTENTION_MECHANISM, NUM_LABELS, NUM_HEADS, COMMON_DIM
  HOST, PORT, XAI=1 to serve the XAI demo app instead of the JSON API
  MAX_BATCH            >1 enables the dynamic-batching frontend
  BATCH_WAIT_MS        batcher linger (default 5 ms)
"""

from __future__ import annotations

import os


def build_engine():
    import jax
    import jax.numpy as jnp

    from skinjax.data.featurizer import MetadataFeaturizer
    from skinjax.models import MultimodalModel
    from skinjax.serve.engine import InferenceEngine

    fz = None
    fz_path = os.environ.get("FEATURIZER_JSON")
    if fz_path and os.path.exists(fz_path):
        fz = MetadataFeaturizer.load(fz_path)

    num_labels = int(os.environ.get("NUM_LABELS", fz.num_classes if fz else 6))
    vocab = int(os.environ.get("VOCAB_SIZE", fz.dim if fz else 91))
    model = MultimodalModel(
        num_classes=num_labels,
        num_heads=int(os.environ.get("NUM_HEADS", 8)),
        cnn_model_name=os.environ.get("CNN_MODEL_NAME", "resnet-50"),
        common_dim=int(os.environ.get("COMMON_DIM", 512)),
        vocab_size=vocab,
        attention_mechanism=os.environ.get(
            "ATTENTION_MECHANISM",
            "att-intramodal+residual+cross-attention-metadados",
        ),
        dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, vocab))
    )
    ckpt = os.environ.get("MODEL_CHECKPOINT")
    if ckpt and os.path.exists(ckpt):
        from skinjax.train.checkpoint import restore_params

        variables = {**variables, "params": restore_params(ckpt, variables["params"])}
    engine = InferenceEngine(model, variables, fz)
    return engine, model, variables


def main():
    engine, model, variables = build_engine()
    host = os.environ.get("HOST", "0.0.0.0")
    port = int(os.environ.get("PORT", 8000))
    if os.environ.get("XAI") == "1":
        from skinjax.serve.xai_app import serve_xai

        serve_xai(engine, model, variables, host, port)
    else:
        max_batch = int(os.environ.get("MAX_BATCH", 1))
        if max_batch > 1:  # dynamic batching for the JSON API path
            from skinjax.serve.batching import BatchingEngine

            engine = BatchingEngine(
                engine,
                max_batch=max_batch,
                max_wait_ms=float(os.environ.get("BATCH_WAIT_MS", 5.0)),
            )
        from skinjax.serve.api import serve

        serve(engine, host, port)


if __name__ == "__main__":
    main()
