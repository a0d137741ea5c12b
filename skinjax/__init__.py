"""skinjax — TPU-native multimodal skin-lesion classification framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
life-ufes/multimodal-model-skin-lesion-classifier (reference mounted read-only
at /root/reference): multimodal (image + clinical metadata) classifiers with a
configurable fusion zoo, k-fold training, XAI, NAS, and serving — built for
TPU from the start (SPMD over a device mesh, static shapes, bf16 on the MXU,
fused Pallas kernels on the fusion path).

Layer map (mirrors SURVEY.md §7):
  configs/   typed config tree, .env-compatible knob names
  data/      metadata featurizer (JSON-persisted), dataset schemas, k-fold
             splitters, on-device augmentation, input pipeline
  models/    backbones (Flax, NHWC), text towers, fusion zoo, baselines
  ops/       core ops incl. torch-semantics MHA and Pallas TPU kernels
  parallel/  mesh construction + sharding rules (dp × tp)
  train/     losses, metrics, optimizer/schedule, train step, k-fold driver
  eval/      metric aggregation, plots, statistics (Friedman/Wilcoxon)
  xai/       Grad-CAM/++/ScoreCAM, flip-rate, uncertainty, FDS, missing-data
  nas/       search space, REINFORCE controller, BO, LLM-as-controller
  serve/     inference engine, HTTP API, export
  tracking/  lightweight MLflow-style experiment tracker (file-based)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keep `import skinjax` light)."""
    if name in ("MultimodalModel", "MECHANISMS", "create_model"):
        from skinjax import models

        return getattr(models, name)
    if name in ("TrainConfig", "train_process", "run_kfold"):
        from skinjax import train

        return getattr(train, name)
    if name == "InferenceEngine":
        from skinjax.serve import InferenceEngine

        return InferenceEngine
    raise AttributeError(f"module 'skinjax' has no attribute '{name}'")
