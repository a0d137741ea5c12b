"""Migration CLI: reference torch checkpoint + sklearn pickles → skinjax.

One command takes what a reference user already has on disk —
``model.pth`` / ``best_model.pt`` state_dicts (utils/save_model_and_metrics
.py:63-66) and the pickled OneHotEncoder/StandardScaler/LabelEncoder under
``data/preprocess_data/`` (skinLesionDatasets.py:154-198) — and produces an
orbax params checkpoint plus a JSON featurizer that the skinjax serving/XAI
stack loads directly.

  python -m skinjax.tools.migrate_cli \
      --state-dict model.pth --backbone resnet-50 --common-dim 512 \
      --mechanism att-intramodal+residual+cross-attention-metadados \
      --ohe-pickle ohe_pad_20.pickle --scaler-pickle scaler_pad_20.pickle \
      --label-pickle label_encoder_pad_20.pickle \
      --categorical-cols smoke drink ... --numerical-cols age diameter_1 diameter_2 \
      --out ./migrated
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="reference -> skinjax migration")
    p.add_argument("--state-dict", required=True, help="torch .pth/.pt path")
    p.add_argument("--backbone", default="resnet-50")
    p.add_argument("--common-dim", type=int, default=512)
    p.add_argument("--mechanism",
                   default="att-intramodal+residual+cross-attention-metadados")
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--ohe-pickle", default=None)
    p.add_argument("--scaler-pickle", default=None)
    p.add_argument("--label-pickle", default=None)
    p.add_argument("--categorical-cols", nargs="*", default=[])
    p.add_argument("--numerical-cols", nargs="*", default=[])
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--text-model", default="one-hot-encoder",
                   help="text tower of the checkpoint: 'one-hot-encoder' "
                        "(default) or an HF name ('bert-base-uncased', "
                        "'gpt2') for sentence models whose state_dict "
                        "carries text_encoder.* weights")
    p.add_argument("--max-seq-length", type=int, default=256)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from skinjax.data.featurizer import MetadataFeaturizer
    from skinjax.models import MultimodalModel
    from skinjax.models.torch_import import (
        filter_to_template,
        import_multimodal_checkpoint,
        load_torch_state_dict,
    )
    from skinjax.train.checkpoint import save_params

    os.makedirs(args.out, exist_ok=True)

    # 1) featurizer from the reference pickles
    fz = None
    if args.ohe_pickle:
        fz = MetadataFeaturizer.from_sklearn_pickles(
            categorical_cols=list(args.categorical_cols),
            numerical_cols=list(args.numerical_cols),
            ohe_pickle=args.ohe_pickle,
            scaler_pickle=args.scaler_pickle,
            label_pickle=args.label_pickle,
        )
        fz.save(os.path.join(args.out, "featurizer.json"))

    vocab = fz.dim if fz else 91
    num_classes = args.num_classes or (fz.num_classes if fz and fz.num_classes else 6)

    # 2) torch state_dict -> flax params
    sd = load_torch_state_dict(args.state_dict)
    params, stats = import_multimodal_checkpoint(
        sd, common_dim=args.common_dim, backbone=args.backbone
    )

    if args.text_model != "one-hot-encoder":
        # sentence model: tokens-mode template; the encoder config comes
        # from the checkpoint's own text_encoder.* shapes via
        # build_sentence_tower's config fallback (weights are imported
        # below, so random init in the template is irrelevant)
        from skinjax.models.text.sentence import build_sentence_tower

        tower = build_sentence_tower(args.text_model)
        dim = tower.encoder.hidden_size
        model = MultimodalModel(
            num_classes=num_classes, num_heads=args.num_heads,
            cnn_model_name=args.backbone, common_dim=args.common_dim,
            text_model_name=args.text_model, text_module=tower,
            text_input_mode="tokens", text_encoder_dim_output=dim,
            attention_mechanism=args.mechanism,
        )
        meta = {
            "input_ids": jnp.zeros((1, args.max_seq_length), jnp.int32),
            "attention_mask": jnp.ones((1, args.max_seq_length), jnp.int32),
        }
    else:
        model = MultimodalModel(
            num_classes=num_classes, num_heads=args.num_heads,
            cnn_model_name=args.backbone, common_dim=args.common_dim,
            vocab_size=vocab, attention_mechanism=args.mechanism,
        )
        meta = jnp.zeros((1, vocab))
    img = jnp.zeros((1, args.image_size, args.image_size, 3))
    template = model.init(jax.random.key(0), img, meta)
    params = filter_to_template(params, template["params"])
    stats = filter_to_template(stats, template.get("batch_stats", {}))

    save_params(os.path.join(args.out, "params"), params)
    save_params(os.path.join(args.out, "batch_stats"), stats)
    with open(os.path.join(args.out, "model_config.json"), "w") as f:
        json.dump({
            "backbone": args.backbone, "common_dim": args.common_dim,
            "mechanism": args.mechanism, "num_heads": args.num_heads,
            "num_classes": num_classes, "vocab_size": vocab,
            "text_model": args.text_model,
            "max_seq_length": args.max_seq_length,
        }, f, indent=1)
    print(json.dumps({"out": args.out, "num_classes": num_classes,
                      "vocab_size": vocab}))


if __name__ == "__main__":
    main()
