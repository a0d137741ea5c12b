"""Per-dataset schema adapters for the 8 dermatology dataset families.

Each adapter rebuilds the cleaning + featurization contract of one reference
dataset class (src/scripts/benchmark/models/skinLesionDatasets*.py) on top of
the schema-driven ``MetadataFeaturizer``:

  PAD-UFES-20   skinLesionDatasets.py:123-201        6-class, group=patient_id
  PAD-UFES-25   skinLesionDatasetsPAD2025.py:156-240 label=macroCIDDiagnostic
  ISIC-2019     skinLesionDatasetsISIC2019.py:128-182 8-class, group=lesion_id
  ISIC-2020     skinLesionDatasetsISIC2020.py:120-198 binary target
  DERM7PT       skinLesionDatasetsDERM7PT.py          derm/clinic image types
  MIDAS         skinLesionDatasetsMIDAS.py:109-191   binary benign/malignant
  MILK10K       skinLesionDatasetsMILK10K.py:156-273 binary/multilabel
  SkinDisNet    skinLesionDatasetsSkinDisNet.py:124-146 3 features, no scaling

An adapter takes the raw CSV (pandas on the host — data prep is IO, not TPU
work), applies the cleaning rules, and yields a plain dict of columns + labels
+ image ids + group ids, so the rest of the pipeline is dataset-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from skinjax.data.featurizer import MetadataFeaturizer

EMPTY = "EMPTY"


@dataclasses.dataclass
class DatasetSpec:
    name: str
    label_col: str
    image_col: str
    drop_cols: Sequence[str]
    numerical_cols: Sequence[str]  # () means "infer from dtypes"
    categorical_cols: Sequence[str] = ()  # () means "everything not numeric"
    group_col: Optional[str] = None  # patient/lesion grouping for CV splits
    image_suffix: str = ""
    scale_numerics: bool = True
    type_of_problem: str = "multiclass"  # or "binaryclass"
    clean: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None
    # optional derived-label hook (e.g. MIDAS: midas_path startswith
    # 'malignant'); receives the cleaned frame, returns string labels
    label_fn: Optional[Callable[[pd.DataFrame], np.ndarray]] = None


def _clean_pad20(df: pd.DataFrame) -> pd.DataFrame:
    # skinLesionDatasets.py:123-128: NaN→EMPTY, stray spaces→EMPTY,
    # "NÃO  ENCONTRADO"→EMPTY, BRASIL→BRAZIL
    df = df.fillna(EMPTY).replace(" ", EMPTY).replace("  ", EMPTY)
    df = df.replace("NÃO  ENCONTRADO", EMPTY).replace("BRASIL", "BRAZIL")
    return df


def _clean_default(df: pd.DataFrame) -> pd.DataFrame:
    return df.fillna(EMPTY)


# PAD-25 macro-CID cluster map (skinLesionDatasetsPAD2025.py:30-40): CID
# diagnostic codes collapse to macro clusters; unmapped codes are dropped
# (convert_ids_labels, :156-160). PAD-25 also normalizes extra sentinel
# strings (load_metadata, :116-133).
PAD25_CLUSTER_TARGETS = {
    "C43": "MEL", "D03": "MEL", "D22": "NEVO", "C80": "CBC", "C44": "CEC",
    "D04": "CEC", "L57": "ACT", "L78": "NEVO", "L82": "SEBO",
}


def _clean_pad25(df: pd.DataFrame) -> pd.DataFrame:
    if "img-src" in df:
        df = df[df["img-src"] == "CLINICAL"].copy()
    # full sentinel set (skinLesionDatasetsPAD2025.py:116-133): stray spaces,
    # "NÃO  ENCONTRADO", "NAO PREENCHIDO", lone "I" → EMPTY; BRASIL → BRAZIL
    df = df.replace(
        {"NAO PREENCHIDO": EMPTY, "NÃO  ENCONTRADO": EMPTY, "BRASIL": "BRAZIL",
         " ": EMPTY, "  ": EMPTY, "I": EMPTY}
    )
    if "age" in df:
        # :113-114 — missing/EMPTY age becomes 0 before numeric coercion
        df["age"] = pd.to_numeric(
            df["age"].replace(EMPTY, 0), errors="coerce"
        ).fillna(0)
    if "macroCIDDiagnostic" in df:
        df["macroCIDDiagnostic"] = df["macroCIDDiagnostic"].map(
            PAD25_CLUSTER_TARGETS
        )
        df = df.dropna(subset=["macroCIDDiagnostic"])
    return df.fillna(EMPTY)


# ISIC-2020 multiclass diagnosis collapse (skinLesionDatasetsISIC2020.py:121-136):
# raw diagnosis strings map to NEV/MEL/BKL/UNK; unmapped rows are dropped.
ISIC2020_DIAGNOSIS_MAP = {
    "nevus": "NEV",
    "melanoma": "MEL",
    "seborrheic keratosis": "BKL",
    "lentigo NOS": "BKL",
    "lichenoid keratosis": "BKL",
    "solar lentigo": "BKL",
    "cafe-au-lait macule": "UNK",
    "atypical melanocytic proliferation": "UNK",
    "unknown": "UNK",
}


def _clean_isic2020_multiclass(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["diagnosis"] = df["diagnosis"].map(ISIC2020_DIAGNOSIS_MAP)
    df = df.dropna(subset=["diagnosis"]).reset_index(drop=True)
    return _clean_default(df)


MILK10K_MALIGNANT = {"MEL", "BCC", "SCCKA", "AKIEC", "MAL_OTH"}
MILK10K_BENIGN = {"NV", "BKL", "DF", "VASC", "BEN_OTH", "INF"}


def milk10k_labels(df: pd.DataFrame, type_of_problem: str = "binaryclass") -> np.ndarray:
    """Labels from the merged ground-truth one-hot diagnosis columns
    (skinLesionDatasetsMILK10K.py:216-264): multiclass argmax or
    binary any-malignant."""
    diag = [c for c in df.columns
            if c in MILK10K_MALIGNANT or c in MILK10K_BENIGN]
    if not diag:
        raise KeyError("Nenhuma coluna de diagnóstico encontrada no ground truth!")
    y = df[diag].apply(pd.to_numeric, errors="coerce").fillna(0).to_numpy(float)
    if type_of_problem == "multiclass":
        return np.asarray([diag[i] for i in y.argmax(axis=1)])
    mal_idx = [i for i, c in enumerate(diag) if c in MILK10K_MALIGNANT]
    return np.where(y[:, mal_idx].sum(axis=1) > 0, "MALIGNANT", "BENIGN")


SPECS: Dict[str, DatasetSpec] = {
    "pad-ufes-20": DatasetSpec(
        name="pad-ufes-20",
        label_col="diagnostic",
        image_col="img_id",
        drop_cols=("patient_id", "lesion_id", "img_id", "biopsed", "diagnostic"),
        numerical_cols=("age", "diameter_1", "diameter_2"),
        group_col="patient_id",
        clean=_clean_pad20,
    ),
    "pad-ufes-25": DatasetSpec(
        name="pad-ufes-25",
        label_col="macroCIDDiagnostic",
        image_col="img-id",
        drop_cols=("img-id", "img-src", "macroCIDDiagnostic", "patient-id"),
        numerical_cols=("age",),
        group_col="patient-id",
        image_suffix=".png",
        clean=_clean_pad25,
    ),
    "isic-2019": DatasetSpec(
        name="isic-2019",
        label_col="category",
        image_col="image",
        drop_cols=("image", "lesion_id", "category"),
        numerical_cols=(),  # dtype-inferred (skinLesionDatasetsISIC2019.py:136)
        group_col="lesion_id",
        image_suffix=".jpg",
        clean=_clean_default,
    ),
    "isic-2020": DatasetSpec(
        name="isic-2020",
        label_col="benign_malignant",
        image_col="image_name",
        drop_cols=("image_name", "patient_id", "diagnosis", "benign_malignant", "target"),
        numerical_cols=(),
        group_col="patient_id",
        image_suffix=".jpg",
        type_of_problem="binaryclass",
        clean=_clean_default,
    ),
    # multiclass `diagnosis` mode (skinLesionDatasetsISIC2020.py:136): same
    # feature space as binary ISIC-2020, labels from the collapsed diagnosis
    "isic-2020-multiclass": DatasetSpec(
        name="isic-2020-multiclass",
        label_col="diagnosis",
        image_col="image_name",
        drop_cols=("image_name", "patient_id", "diagnosis", "benign_malignant", "target"),
        numerical_cols=(),
        group_col="patient_id",
        image_suffix=".jpg",
        type_of_problem="multiclass",
        clean=_clean_isic2020_multiclass,
    ),
    "derm7pt": DatasetSpec(
        name="derm7pt",
        label_col="diagnosis",
        image_col="derm",  # or "clinic" — selected via image_col override
        # skinLesionDatasetsDERM7PT.py:165-186 ignore/numeric lists
        drop_cols=("case_num", "case_id", "clinic", "derm", "notes", "split",
                   "diagnosis", "diagnosis_number"),
        numerical_cols=(
            "seven_point_score", "pigment_network_number", "streaks_number",
            "pigmentation_number", "regression_structures_number",
            "dots_and_globules_number", "blue_whitish_veil_number",
            "vascular_structures_number",
        ),
        group_col="case_num",
        clean=_clean_default,
    ),
    "midas": DatasetSpec(
        name="midas",
        label_col="midas_path",  # derived binary label (see label_fn)
        image_col="midas_file_name",
        drop_cols=(),
        # skinLesionDatasetsMIDAS.py:109-115 explicit feature lists
        numerical_cols=("midas_age", "length_mm", "width_mm"),
        categorical_cols=(
            "midas_gender", "midas_fitzpatrick", "midas_ethnicity", "midas_race",
            "midas_location", "midas_melanoma", "midas_distance",
            "clinical_impression_1", "clinical_impression_2",
            "clinical_impression_3",
        ),
        group_col="midas_record_id",
        type_of_problem="binaryclass",
        clean=_clean_default,
        # skinLesionDatasetsMIDAS.py:122-126: malignant iff midas_path
        # startswith 'malignant'
        label_fn=lambda df: np.where(
            df["midas_path"].astype(str).str.lower().str.startswith("malignant"),
            "malignant", "benign",
        ),
    ),
    "milk10k": DatasetSpec(
        name="milk10k",
        label_col="target",  # derived from the one-hot ground-truth columns
        image_col="isic_id",
        # skinLesionDatasetsMILK10K.py:153-183 feature lists
        drop_cols=("image_type", "attribution", "copyright_license"),
        numerical_cols=(
            "age_approx", "MONET_ulceration_crust", "MONET_hair",
            "MONET_vasculature_vessels", "MONET_erythema", "MONET_pigmented",
            "MONET_gel_water_drop_fluid_dermoscopy_liquid",
            "MONET_skin_markings_pen_ink_purple_pen",
        ),
        categorical_cols=("image_manipulation", "sex", "skin_tone_class", "site"),
        group_col="lesion_id",
        image_suffix=".jpg",
        type_of_problem="binaryclass",
        clean=_clean_default,
        label_fn=lambda df: milk10k_labels(df, "binaryclass"),
    ),
    # 11-class mode (skinLesionDatasetsMILK10K.py:231-236): argmax over the
    # merged one-hot diagnosis ground-truth columns
    "milk10k-multiclass": DatasetSpec(
        name="milk10k-multiclass",
        label_col="target",
        image_col="isic_id",
        drop_cols=("image_type", "attribution", "copyright_license"),
        numerical_cols=(
            "age_approx", "MONET_ulceration_crust", "MONET_hair",
            "MONET_vasculature_vessels", "MONET_erythema", "MONET_pigmented",
            "MONET_gel_water_drop_fluid_dermoscopy_liquid",
            "MONET_skin_markings_pen_ink_purple_pen",
        ),
        categorical_cols=("image_manipulation", "sex", "skin_tone_class", "site"),
        group_col="lesion_id",
        image_suffix=".jpg",
        type_of_problem="multiclass",
        clean=_clean_default,
        label_fn=lambda df: milk10k_labels(df, "multiclass"),
    ),
    "skindisnet": DatasetSpec(
        name="skindisnet",
        label_col="Label",
        image_col="Image_Name",
        drop_cols=("Image_Name", "Label"),
        numerical_cols=("Age",),
        scale_numerics=False,  # skinLesionDatasetsSkinDisNet.py:146
        clean=_clean_default,
    ),
}


@dataclasses.dataclass
class PreparedDataset:
    """Dataset-agnostic output of a schema adapter."""

    name: str
    image_files: List[str]
    features: np.ndarray  # (N, F) float32 featurized metadata
    labels: np.ndarray  # (N,) int32
    groups: np.ndarray  # (N,) group ids for grouped CV
    class_names: List[str]
    featurizer: MetadataFeaturizer
    raw: pd.DataFrame  # cleaned metadata table (for XAI perturbation sweeps)

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    @property
    def feature_dim(self) -> int:
        return self.features.shape[1]


def prepare_dataset(
    dataset: str,
    metadata_csv: Optional[str],
    featurizer_path: Optional[str] = None,
    image_col: Optional[str] = None,
    label_col: Optional[str] = None,
    df: Optional[pd.DataFrame] = None,
    unlabeled: bool = False,
) -> PreparedDataset:
    """Load + clean a CSV and featurize it under the dataset's schema.

    If ``featurizer_path`` exists it is loaded (serving path — identical
    feature space as training, skinLesionDatasets.py:154-175); otherwise the
    featurizer is fitted and, when a path is given, persisted.

    ``df`` bypasses the CSV read (pre-merged frames, e.g. MILK10K ground-truth
    joins). ``unlabeled=True`` is the challenge-test mode
    (skinLesionDatasetsMILK10K.py:46-51): no labels exist, the featurizer MUST
    load from ``featurizer_path`` (the training feature space), and ``labels``
    comes back as all ``-1``.
    """
    spec = SPECS[dataset]
    if df is None:
        df = pd.read_csv(metadata_csv)
    if spec.clean is not None:
        df = spec.clean(df)
    df = df.reset_index(drop=True)

    img_col = image_col or spec.image_col
    lbl_col = label_col or spec.label_col

    if spec.categorical_cols:
        # explicit feature lists (MIDAS/MILK10K style) — missing columns are
        # materialized as EMPTY/-1 (reference parity)
        feature_df = df.copy()
        numerical = list(spec.numerical_cols)
        categorical = list(spec.categorical_cols)
        for c in categorical:
            if c not in feature_df.columns:
                feature_df[c] = EMPTY
        for c in numerical:
            if c not in feature_df.columns:
                feature_df[c] = np.nan
        feature_df = feature_df[categorical + numerical]
    else:
        feature_df = df.drop(columns=[c for c in spec.drop_cols if c in df.columns])
        if spec.numerical_cols:
            numerical = [c for c in spec.numerical_cols if c in feature_df.columns]
        else:  # dtype-inferred split (ISIC path)
            numerical = list(
                feature_df.select_dtypes(include=["float64", "int64"]).columns
            )
        categorical = [c for c in feature_df.columns if c not in numerical]

    feature_df[categorical] = feature_df[categorical].astype(str)
    for c in numerical:
        feature_df[c] = pd.to_numeric(feature_df[c], errors="coerce").fillna(-1)

    table = {c: feature_df[c].to_numpy() for c in feature_df.columns}
    labels_raw = (
        None if unlabeled
        else np.asarray(spec.label_fn(df)).astype(str)
        if spec.label_fn is not None
        else df[lbl_col].astype(str).to_numpy()
    )

    import os

    if featurizer_path and os.path.exists(featurizer_path):
        fz = MetadataFeaturizer.load(featurizer_path)
    elif unlabeled:
        raise ValueError(
            "unlabeled (challenge-test) mode requires a persisted featurizer "
            "from training — pass featurizer_path to an existing file"
        )
    else:
        fz = MetadataFeaturizer(
            categorical_cols=categorical,
            numerical_cols=numerical,
            scale_numerics=spec.scale_numerics,
        ).fit(table, labels_raw)
        if featurizer_path:
            fz.save(featurizer_path)

    features = fz.transform(table)
    labels = (
        np.full(len(df), -1, np.int32) if unlabeled
        else fz.label_encoder.transform(labels_raw)
    )
    groups = (
        df[spec.group_col].to_numpy()
        if spec.group_col and spec.group_col in df.columns
        else np.arange(len(df))
    )
    image_files = [str(v) + spec.image_suffix for v in df[img_col].to_numpy()]
    if dataset.startswith("milk10k") and "lesion_id" in df.columns:
        # MILK10K images live in per-lesion subdirectories
        # (skinLesionDatasetsMILK10K.py:56-59: img_dir/<lesion_id>/<isic_id>.jpg)
        image_files = [
            os.path.join(str(l), f) for l, f in zip(df["lesion_id"], image_files)
        ]

    return PreparedDataset(
        name=dataset,
        image_files=image_files,
        features=features,
        labels=labels,
        groups=np.asarray(groups),
        class_names=list(fz.label_encoder.classes),
        featurizer=fz,
        raw=df,
    )


def prepare_milk10k(
    metadata_csv: str,
    ground_truth_csv: Optional[str] = None,
    image_type: str = "clinical: close-up",
    type_of_problem: str = "binaryclass",
    featurizer_path: Optional[str] = None,
) -> PreparedDataset:
    """MILK10K with the reference's split handling
    (skinLesionDatasetsMILK10K.py:123-145): sentinel-clean the metadata CSV,
    filter to one ``image_type`` BEFORE the ground-truth merge, left-merge the
    one-hot diagnosis ground truth on ``lesion_id``. With
    ``ground_truth_csv=None`` this is the challenge-test split (:46-51):
    features are built from a persisted training featurizer and labels are -1.
    """
    md = pd.read_csv(metadata_csv, dtype=str)
    md = md.fillna(EMPTY).replace(
        {" ": EMPTY, "  ": EMPTY, "NÃO  ENCONTRADO": EMPTY}
    )
    md = md[md["image_type"] == image_type].reset_index(drop=True)
    if ground_truth_csv is not None:
        gt = pd.read_csv(ground_truth_csv, dtype=str)
        md = md.merge(gt, on="lesion_id", how="left", suffixes=("", "_gt"))
    name = "milk10k" if type_of_problem == "binaryclass" else "milk10k-multiclass"
    return prepare_dataset(
        name, None, featurizer_path=featurizer_path, df=md,
        unlabeled=ground_truth_csv is None,
    )
