"""Schema-fidelity tests for the non-PAD dataset adapters."""

import numpy as np
import pandas as pd
import pytest

from skinjax.data.schemas import milk10k_labels, prepare_dataset


def test_midas_derived_binary_label(tmp_path):
    rng = np.random.default_rng(0)
    n = 20
    df = pd.DataFrame({
        "midas_file_name": [f"m{i}.jpg" for i in range(n)],
        "midas_record_id": [f"R{i % 7}" for i in range(n)],
        "midas_path": rng.choice(
            ["malignant-melanoma", "benign-nevus", "Malignant other"], n
        ),
        "midas_gender": rng.choice(["M", "F"], n),
        "midas_fitzpatrick": rng.choice(["I", "II", "III"], n),
        "midas_ethnicity": "E", "midas_race": "R",
        "midas_location": rng.choice(["arm", "leg"], n),
        "midas_melanoma": "no", "midas_distance": "near",
        "clinical_impression_1": "a", "clinical_impression_2": "b",
        "clinical_impression_3": "c",
        "midas_age": rng.integers(20, 90, n),
        "length_mm": rng.uniform(1, 9, n),
        "width_mm": rng.uniform(1, 9, n),
    })
    csv = tmp_path / "midas.csv"
    df.to_csv(csv, index=False)
    ds = prepare_dataset("midas", str(csv))
    assert ds.class_names == ["benign", "malignant"]
    expected = df["midas_path"].str.lower().str.startswith("malignant")
    np.testing.assert_array_equal(ds.labels == 1, expected.to_numpy())
    # features: 10 categorical + 3 numeric columns
    assert ds.feature_dim == ds.featurizer.ohe.dim + 3
    assert ds.featurizer.numerical_cols == ["midas_age", "length_mm", "width_mm"]


def test_milk10k_labels_binary_and_multiclass():
    df = pd.DataFrame({
        "MEL": [1, 0, 0], "NV": [0, 1, 0], "BCC": [0, 0, 0], "BKL": [0, 0, 1],
        "other_admin": ["x", "y", "z"],
    })
    b = milk10k_labels(df, "binaryclass")
    np.testing.assert_array_equal(b, ["MALIGNANT", "BENIGN", "BENIGN"])
    m = milk10k_labels(df, "multiclass")
    np.testing.assert_array_equal(m, ["MEL", "NV", "BKL"])


def test_milk10k_prepare(tmp_path):
    rng = np.random.default_rng(1)
    n = 12
    df = pd.DataFrame({
        "isic_id": [f"ISIC_{i:05d}" for i in range(n)],
        "lesion_id": [f"L{i % 5}" for i in range(n)],
        "image_type": "dermoscopy", "attribution": "x", "copyright_license": "y",
        "image_manipulation": rng.choice(["none", "crop"], n),
        "sex": rng.choice(["male", "female"], n),
        "skin_tone_class": rng.choice(["A", "B"], n),
        "site": rng.choice(["head", "torso"], n),
        "age_approx": rng.integers(10, 90, n),
        "MONET_ulceration_crust": rng.uniform(0, 1, n),
        "MONET_hair": rng.uniform(0, 1, n),
        "MONET_vasculature_vessels": rng.uniform(0, 1, n),
        "MONET_erythema": rng.uniform(0, 1, n),
        "MONET_pigmented": rng.uniform(0, 1, n),
        "MONET_gel_water_drop_fluid_dermoscopy_liquid": rng.uniform(0, 1, n),
        "MONET_skin_markings_pen_ink_purple_pen": rng.uniform(0, 1, n),
        "MEL": (np.arange(n) % 3 == 0).astype(int),
        "NV": (np.arange(n) % 3 != 0).astype(int),
    })
    csv = tmp_path / "milk.csv"
    df.to_csv(csv, index=False)
    ds = prepare_dataset("milk10k", str(csv))
    assert ds.class_names == ["BENIGN", "MALIGNANT"]
    assert (ds.labels == 1).sum() == (np.arange(n) % 3 == 0).sum()
    # features: 4 categorical + 8 numeric; diagnosis columns NOT in features
    assert len(ds.featurizer.numerical_cols) == 8
    assert set(ds.featurizer.categorical_cols) == {
        "image_manipulation", "sex", "skin_tone_class", "site",
    }
    assert ds.image_files[0] == "ISIC_00000.jpg"


def test_derm7pt_prepare(tmp_path):
    rng = np.random.default_rng(2)
    n = 10
    df = pd.DataFrame({
        "case_num": np.arange(n), "case_id": np.arange(n),
        "clinic": [f"c{i}.jpg" for i in range(n)],
        "derm": [f"d{i}.jpg" for i in range(n)],
        "notes": "", "split": "train",
        "diagnosis": rng.choice(["nevus", "melanoma"], n),
        "diagnosis_number": rng.integers(0, 2, n),
        "sex": rng.choice(["m", "f"], n),
        "location": rng.choice(["back", "arm"], n),
        "seven_point_score": rng.integers(0, 7, n),
        "pigment_network_number": rng.integers(0, 3, n),
    })
    csv = tmp_path / "derm.csv"
    df.to_csv(csv, index=False)
    ds = prepare_dataset("derm7pt", str(csv))
    assert ds.image_files[0] == "d0.jpg"
    ds_clinic = prepare_dataset("derm7pt", str(csv), image_col="clinic")
    assert ds_clinic.image_files[0] == "c0.jpg"
    # numeric criteria recognized; diagnosis_number not a feature
    assert "seven_point_score" in ds.featurizer.numerical_cols
    assert "diagnosis_number" not in (
        ds.featurizer.numerical_cols + ds.featurizer.categorical_cols
    )
