"""Accuracy-parity runbook: reference checkpoint -> 5-fold BACC deltas.

The north-star claim (BASELINE.md) — "BACC within 0.5% of the published
table" (scripts/others/frugality_bacc_by_models.py:5-17) — is unprovable in
this container (zero egress: no PAD-UFES-20 images, no trained ``.pth``).
This tool makes it ONE command the moment data/weights are available:

  python -m skinjax.tools.parity_runbook \
      --state-dict best_model_resnet-50.pth --backbone resnet-50 \
      --mechanism att-intramodal+residual+cross-attention-metadados \
      --metadata-csv PAD-UFES-20/metadata.csv --images-dir PAD-UFES-20/images

It ingests the torch state_dict through the production importer
(models/torch_import.py — the same path tools/migrate_cli.py uses), rebuilds
the reference's StratifiedGroupKFold patient split (train_pad_20.py:239,
seed 42), evaluates the imported model on every validation fold, and prints
per-fold BACC, the mean, and the delta vs the published number for the
backbone. ``run_parity`` is importable so the dry-run test can drive the
whole path with synthetic weights/data (tests/test_parity_runbook.py).
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional, Sequence

# frugality_bacc_by_models.py:5-17 ("Feature Extractor" -> "BACC (%)")
PUBLISHED_BACC: Dict[str, float] = {
    "mvitv2_small": 0.8137,
    "coat_lite_small": 0.7919,
    "davit_tiny": 0.8228,
    "caformer_b36": 0.8062,
    "beitv2_large_patch16_224": 0.8074,
    "nextvit_small": 0.8067,
    "vgg16": 0.7776,
    "mobilenet-v2": 0.7999,
    "densenet169": 0.8048,
    "resnet-50": 0.8164,
}


def run_parity(
    state_dict: Dict,
    backbone: str,
    mechanism: str,
    source,
    labels,
    groups,
    num_classes: int,
    num_heads: int = 8,
    common_dim: int = 512,
    vocab_size: Optional[int] = None,
    k_folds: int = 5,
    batch_size: int = 32,
    seed: int = 42,
    published: Optional[float] = None,
    image_dtype: str = "bfloat16",
) -> Dict:
    """Import ``state_dict`` and evaluate it on every k-fold val split.

    Returns {"folds": [bacc...], "mean_bacc", "published", "delta"}.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from skinjax.data.splits import stratified_group_kfold, stratified_kfold
    from skinjax.models import MultimodalModel
    from skinjax.models.torch_import import (
        filter_to_template,
        import_multimodal_checkpoint,
    )
    from skinjax.train.kfold import SubsetSource
    from skinjax.train.loop import evaluate
    from skinjax.train.steps import TrainState, make_eval_step

    if vocab_size is None:
        vocab_size = int(source.batch(np.arange(1))["metadata"].shape[1])
    model = MultimodalModel(
        num_classes=num_classes, num_heads=num_heads, cnn_model_name=backbone,
        common_dim=common_dim, text_encoder_dim_output=common_dim,
        vocab_size=vocab_size, attention_mechanism=mechanism,
        dtype=jnp.bfloat16 if image_dtype == "bfloat16" else None,
    )
    params, stats = import_multimodal_checkpoint(
        state_dict, common_dim=common_dim, backbone=backbone)
    sample = source.batch(np.arange(1))
    variables = model.init(
        jax.random.key(0), jnp.asarray(sample["image"], jnp.float32),
        jnp.asarray(sample["metadata"]))
    params = filter_to_template(params, variables["params"])
    stats = filter_to_template(stats, variables.get("batch_stats", {}))
    state = TrainState(params=params, batch_stats=stats, opt_state=None,
                       step=0)
    eval_step = make_eval_step(
        model,
        image_dtype=jnp.bfloat16 if image_dtype == "bfloat16"
        else jnp.float32)

    labels = np.asarray(labels)
    if groups is not None:
        folds = stratified_group_kfold(labels, np.asarray(groups),
                                       n_splits=k_folds, seed=seed)
    else:
        folds = stratified_kfold(labels, n_splits=k_folds, seed=seed)
    per_fold = []
    for fold_num, (_, va_idx) in enumerate(folds, start=1):
        metrics, _, _, _, _ = evaluate(
            eval_step, state, SubsetSource(source, va_idx), batch_size,
            num_classes)
        per_fold.append(float(metrics["balanced_accuracy"]))
        print(f"fold {fold_num}: bacc={per_fold[-1]:.4f}", flush=True)
    mean = float(np.mean(per_fold))
    if published is None:
        published = PUBLISHED_BACC.get(backbone)
    out = {
        "backbone": backbone,
        "mechanism": mechanism,
        "folds": [round(b, 4) for b in per_fold],
        "mean_bacc": round(mean, 4),
        "published": published,
        "delta": None if published is None else round(mean - published, 4),
    }
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="reference checkpoint -> 5-fold BACC parity report")
    p.add_argument("--state-dict", required=True)
    p.add_argument("--backbone", default="resnet-50")
    p.add_argument("--mechanism",
                   default="att-intramodal+residual+cross-attention-metadados")
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--common-dim", type=int, default=512)
    p.add_argument("--dataset", default="pad-ufes-20")
    p.add_argument("--metadata-csv", required=True)
    p.add_argument("--images-dir", required=True)
    p.add_argument("--k-folds", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--published-bacc", type=float, default=None,
                   help="override the frugality-table value for --backbone")
    p.add_argument("--out", default=None, help="write the JSON report here")
    args = p.parse_args(argv)

    from skinjax.data.schemas import prepare_dataset
    from skinjax.models.torch_import import load_torch_state_dict
    from skinjax.train.experiments import DATASET_PRESETS, build_source

    prepared = prepare_dataset(args.dataset, args.metadata_csv)
    source = build_source(prepared, args.images_dir)
    grouped = DATASET_PRESETS.get(args.dataset, {"grouped": True})["grouped"]
    sd = load_torch_state_dict(args.state_dict)
    report = run_parity(
        sd, args.backbone, args.mechanism, source, prepared.labels,
        prepared.groups if grouped else None, prepared.num_classes,
        num_heads=args.num_heads, common_dim=args.common_dim,
        vocab_size=prepared.feature_dim, k_folds=args.k_folds,
        batch_size=args.batch_size, seed=args.seed,
        published=args.published_bacc,
    )
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return report


if __name__ == "__main__":
    main()
