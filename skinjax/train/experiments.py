"""Top-level experiment sweeps — the reference's per-dataset ``train_*.py``
entry points (run_expirements triple loop, train_pad_20.py:406-489) unified
behind one driver with per-dataset loss/splitter presets:

  pad-ufes-20  group k-fold (patient), weighted CE   (train_pad_20.py:239,52)
  isic-2019    group k-fold (lesion), CE             (train_isic_2019.py:224)
  isic-2020    stratified k-fold, CE                 (train_isic_2020.py:223)
  derm7pt      focal loss                            (train_derm7pt.py:52)
  midas        group folds (record), focal           (train_midas.py:91,299)
  milk10k      focal                                 (train_milk10K.py:46-138)
  pad-ufes-25 / skindisnet  CE

Every (mechanism × backbone × num_heads) cell runs the full k-fold; failures
are logged and the sweep continues (the reference's try/except-continue,
train_pad_20.py:427,486-488).
"""

from __future__ import annotations

import os
import traceback
from typing import Dict, List, Optional

from skinjax.configs import ExperimentConfig
from skinjax.data.pipeline import FileSource, ImageStore
from skinjax.data.schemas import PreparedDataset, prepare_dataset
from skinjax.models.factory import create_model
from skinjax.train.kfold import run_kfold
from skinjax.train.loop import TrainConfig

DATASET_PRESETS: Dict[str, Dict] = {
    "pad-ufes-20": {"loss": "weighted_ce", "grouped": True},
    "pad-ufes-25": {"loss": "weighted_ce", "grouped": True},
    "isic-2019": {"loss": "weighted_ce", "grouped": True},
    "isic-2020": {"loss": "weighted_ce", "grouped": False},
    "derm7pt": {"loss": "focal", "grouped": True},
    "midas": {"loss": "focal", "grouped": True},
    "milk10k": {"loss": "focal", "grouped": True},
    "skindisnet": {"loss": "weighted_ce", "grouped": False},
}


def build_source(prepared: PreparedDataset, images_dir: str, image_size=(224, 224),
                 cache: bool = True) -> FileSource:
    store = ImageStore(images_dir, size=image_size, cache=cache)
    return FileSource(store, prepared.image_files, prepared.features, prepared.labels)


def build_token_source(
    prepared: PreparedDataset, images_dir: str, text_model_name: str,
    max_seq_length: int = 256, tokenizers_dir: Optional[str] = None,
    image_size=(224, 224), cache: bool = True,
):
    """Sentence-dataset source: tokenize the LLM-generated ``sentence``
    column with the native tokenizer matching ``text_model_name`` and feed
    input_ids/attention_mask as the metadata pytree
    (skinLesionDatasetsWithBert.py:64-73; column name ibid.:64)."""
    from skinjax.data.pipeline import TokenSource
    from skinjax.data.tokenize import load_tokenizer, tokenize_sentences

    if prepared.raw is None or "sentence" not in prepared.raw.columns:
        raise ValueError(
            f"text model {text_model_name!r} needs a 'sentence' column in "
            "the metadata CSV (LLM-generated sentences — see "
            "skinjax.tools.sentences to create one)"
        )
    tok = load_tokenizer(
        text_model_name,
        os.path.join(tokenizers_dir, text_model_name) if tokenizers_dir
        else None,
    )
    enc = tokenize_sentences(
        prepared.raw["sentence"].astype(str).tolist(), tok,
        max_length=max_seq_length)
    store = ImageStore(images_dir, size=image_size, cache=cache)
    return TokenSource(store, prepared.image_files, enc["input_ids"],
                       enc["attention_mask"], prepared.labels)


def run_experiments(
    cfg: ExperimentConfig,
    source=None,
    prepared: Optional[PreparedDataset] = None,
    tracker=None,
    mesh=None,
) -> List[Dict]:
    """The mechanism × backbone × heads sweep. Returns all fold metrics."""
    preset = DATASET_PRESETS.get(cfg.dataset, {"loss": "weighted_ce", "grouped": True})

    if prepared is None:
        metadata_csv = cfg.metadata_csv or os.path.join(
            cfg.dataset_folder_path or ".", "metadata.csv"
        )
        prepared = prepare_dataset(
            cfg.dataset, metadata_csv,
            featurizer_path=os.path.join(
                cfg.results_folder_path, "preprocess_data",
                f"featurizer_{cfg.dataset}.json",
            ),
        )
    if source is None:
        images_dir = cfg.images_dir or os.path.join(
            cfg.dataset_folder_path or ".", "images"
        )
        if cfg.text_model_name.startswith(("bert", "gpt2")):
            # sentence dataset (skinLesionDatasetsWithBert.py): tokenize the
            # LLM-generated 'sentence' column and feed tokens as metadata
            source = build_token_source(
                prepared, images_dir, cfg.text_model_name,
                max_seq_length=cfg.max_seq_length,
                tokenizers_dir=cfg.tokenizers_dir)
        else:
            source = build_source(prepared, images_dir)

    train_cfg = cfg.train
    if train_cfg.loss == "weighted_ce" and preset["loss"] != "weighted_ce":
        import dataclasses

        train_cfg = dataclasses.replace(train_cfg, loss=preset["loss"])
    if (cfg.text_model_name.startswith(("bert", "gpt2"))
            and train_cfg.augment_recipe == "default"):
        # sentence datasets get the heavier augmentation distribution
        # (skinLesionDatasetsWithBert.py:84-110)
        import dataclasses

        train_cfg = dataclasses.replace(train_cfg, augment_recipe="sentence")

    all_metrics: List[Dict] = []
    for mechanism in cfg.attention_mechanisms:
        for backbone in cfg.cnn_model_names:
            for num_heads in cfg.list_num_heads:
                name = f"{cfg.model_name}_{backbone}_{mechanism}_h{num_heads}"
                try:
                    metrics = run_kfold(
                        model_factory=lambda: create_model(
                            num_classes=prepared.num_classes,
                            model_name=cfg.model_name,
                            cnn_model_name=backbone,
                            text_model_name=cfg.text_model_name,
                            attention_mechanism=mechanism,
                            num_heads=num_heads,
                            common_dim=cfg.common_dim,
                            vocab_size=prepared.feature_dim,
                        ),
                        source=source,
                        labels=prepared.labels,
                        groups=prepared.groups if preset["grouped"] else None,
                        num_classes=prepared.num_classes,
                        class_names=prepared.class_names,
                        config=train_cfg,
                        k_folds=cfg.k_folds,
                        results_dir=os.path.join(cfg.results_folder_path, name),
                        model_name=name,
                        tracker=tracker,
                        save_checkpoints=cfg.save_to_disk,
                        mesh=mesh,
                    )
                    for m in metrics:
                        m.update(mechanism=mechanism, backbone=backbone,
                                 num_heads=num_heads, model=name)
                    all_metrics.extend(metrics)
                except Exception:
                    # sweep survives individual failures (train_pad_20.py:486-488)
                    print(f"[experiments] cell {name} failed:")
                    traceback.print_exc()
    return all_metrics
