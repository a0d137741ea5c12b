"""XAI analysis CLI — the reference's interpretability drivers
(run_missing_data_inference.sh → inference_all_folds.py, flip_rate.py) as one
command.

  python -m skinjax.tools.xai_cli missing-data --checkpoint CKPT ...
  python -m skinjax.tools.xai_cli flip-rate    --checkpoint CKPT ...
"""

from __future__ import annotations

import argparse
import csv
import json
import os


def _load_engine(args):
    import jax
    import jax.numpy as jnp

    from skinjax.data.schemas import prepare_dataset
    from skinjax.models import MultimodalModel
    from skinjax.serve.engine import InferenceEngine
    from skinjax.train.checkpoint import restore_params

    prepared = prepare_dataset(
        args.dataset, args.metadata_csv, featurizer_path=args.featurizer
    )
    model = MultimodalModel(
        num_classes=prepared.num_classes, num_heads=args.num_heads,
        cnn_model_name=args.backbone, common_dim=args.common_dim,
        vocab_size=prepared.feature_dim,
        attention_mechanism=args.mechanism,
    )
    img = jnp.zeros((1, 224, 224, 3))
    meta = jnp.zeros((1, prepared.feature_dim))
    variables = model.init(jax.random.key(0), img, meta)
    if args.checkpoint:
        params = restore_params(args.checkpoint, variables["params"])
        variables = {**variables, "params": params}
    engine = InferenceEngine(model, variables, prepared.featurizer,
                             prepared.class_names)
    return engine, prepared


def _batched_predictor(engine, prepared, images_dir, batch: int = 64):
    """features -> probs with the dataset's images fixed."""
    import numpy as np

    from skinjax.data.pipeline import ImageStore
    from skinjax.serve.engine import preprocess_image

    store = ImageStore(images_dir)
    imgs = np.concatenate(
        [preprocess_image(store.get(f)) for f in prepared.image_files]
    )

    def predict(features: np.ndarray) -> np.ndarray:
        out = []
        n = len(features)
        for s in range(0, n, batch):
            e = min(s + batch, n)
            out.append(engine.predict_probs(imgs[s:e], features[s:e]))
        return np.concatenate(out)

    return predict


def main(argv=None):
    p = argparse.ArgumentParser(description="skinjax XAI analyses")
    p.add_argument("analysis", choices=["missing-data", "flip-rate"])
    p.add_argument("--dataset", default="pad-ufes-20")
    p.add_argument("--metadata-csv", required=True)
    p.add_argument("--images-dir", required=True)
    p.add_argument("--featurizer", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--backbone", default="resnet-50")
    p.add_argument("--mechanism",
                   default="att-intramodal+residual+cross-attention-metadados")
    p.add_argument("--common-dim", type=int, default=512)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--rates", nargs="+", type=float,
                   default=[0.0, 0.1, 0.2, 0.3, 0.5, 0.7])
    p.add_argument("--out", default="./results/xai")
    args = p.parse_args(argv)

    engine, prepared = _load_engine(args)
    predict = _batched_predictor(engine, prepared, args.images_dir)
    os.makedirs(args.out, exist_ok=True)

    if args.analysis == "missing-data":
        from skinjax.xai import missing_data_sweep

        rows = missing_data_sweep(
            predict, prepared.raw, prepared.featurizer, prepared.labels,
            fold=args.fold, rates=args.rates,
        )
        out_csv = os.path.join(args.out, "missing_metadata_experiment.csv")
        exists = os.path.exists(out_csv)
        with open(out_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            if not exists:
                w.writeheader()
            w.writerows(rows)
        print(json.dumps(rows, indent=1, default=str))
    else:
        from skinjax.xai import run_flip_analysis

        res = run_flip_analysis(predict, prepared.raw, prepared.featurizer)
        summary = {
            k: {"flip_rate": v["flip_rate"], "n_flips": v["n_flips"]}
            for k, v in res["mutations"].items()
        }
        with open(os.path.join(args.out, "flip_rates.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
