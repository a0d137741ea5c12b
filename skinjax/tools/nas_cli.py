"""NAS CLI — the reference's nas/optimization_*_via_bash drivers as one
command over the strategy library (reinforce / bo / llm / random).

  python -m skinjax.tools.nas_cli --strategy reinforce --steps 50 \
      --dataset pad-ufes-20 --metadata-csv ... --images-dir ...
  python -m skinjax.tools.nas_cli --strategy random --steps 3 --synthetic
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="skinjax NAS search")
    p.add_argument("--strategy", default="reinforce",
                   choices=["reinforce", "bo", "llm", "random"])
    p.add_argument("--steps", type=int, default=None,
                   help="search steps (default: SEARCH_STEPS env or 500)")
    p.add_argument("--dataset", default="pad-ufes-20")
    p.add_argument("--metadata-csv", default=None)
    p.add_argument("--images-dir", default=None)
    p.add_argument("--results-dir", default="./results/nas")
    p.add_argument("--epochs", type=int, default=10,
                   help="inner-training epochs per candidate")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--llm-model", default=None)
    p.add_argument("--early-metric", default="val_bacc",
                   choices=["val_bacc", "val_loss"],
                   help="val_loss reproduces the controller-val-loss variant")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--population", type=int, default=0,
                   help="candidates per vmapped supernet program "
                        "(reinforce/random; 0 = sequential like the "
                        "reference)")
    p.add_argument("--no-memoize", action="store_true",
                   help="retrain repeated configs (reference behavior) "
                        "instead of reusing their deterministic reward")
    p.add_argument("--fixed-envelope", action="store_true",
                   help="train every population bucket inside one "
                        "space-wide supernet envelope per pooling flag, "
                        "programs cached across the search (compile "
                        "amortization — DESIGN 5e-r4 follow-up)")
    p.add_argument("--retrain-best", action="store_true",
                   help="full k-fold retrain of best_config.json afterwards")
    args = p.parse_args(argv)

    import os

    from skinjax.configs import load_env_config
    from skinjax.nas import run_nas
    from skinjax.tracking import Tracker
    from skinjax.train.loop import TrainConfig

    env_cfg = load_env_config(None)
    steps = args.steps or env_cfg.search_steps

    if args.synthetic:
        from skinjax.data import synthetic_source

        source = synthetic_source(n=64, image_size=(32, 32), feature_dim=32,
                                  num_classes=6)
        num_classes = 6
        groups = None
        labels = source.labels
        class_names = [str(i) for i in range(6)]
    else:
        from skinjax.data.schemas import prepare_dataset
        from skinjax.train.experiments import build_source

        prepared = prepare_dataset(args.dataset, args.metadata_csv)
        source = build_source(prepared, args.images_dir)
        num_classes = prepared.num_classes
        groups = prepared.groups
        labels = prepared.labels
        class_names = prepared.class_names

    tracker = Tracker(root=os.path.join(args.results_dir, "tracking"))
    tracker.set_experiment(f"nas-{args.strategy}")

    train_cfg = TrainConfig(
        num_epochs=args.epochs, batch_size=args.batch_size,
        early_stopping_patience=5, early_stopping_metric=args.early_metric,
    )
    with tracker.start_run(f"{args.strategy}-{steps}steps"):
        best_cfg, best_reward, log = run_nas(
            source, num_classes, strategy=args.strategy, search_steps=steps,
            train_cfg=train_cfg, results_dir=args.results_dir,
            llm_model_name=args.llm_model, tracker=tracker,
            population_size=args.population, memoize=not args.no_memoize,
            fixed_envelope=args.fixed_envelope,
        )
    print(json.dumps({"best_config": best_cfg, "best_reward": best_reward},
                     default=str))

    if args.retrain_best:
        from skinjax.nas import retrain_best

        metrics = retrain_best(
            source, labels, groups, num_classes, class_names,
            os.path.join(args.results_dir, "best_config.json"),
            train_cfg=train_cfg,
            results_dir=os.path.join(args.results_dir, "retrain"),
        )
        print(json.dumps({"retrain_folds": metrics}, default=str))


if __name__ == "__main__":
    main()
