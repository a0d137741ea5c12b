"""Schema-fidelity tests for the non-PAD dataset adapters."""

import os

import numpy as np
import pandas as pd
import pytest

from skinjax.data.schemas import milk10k_labels, prepare_dataset, prepare_milk10k


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
    # per-lesion subdirectory layout (skinLesionDatasetsMILK10K.py:56-59)
    assert ds.image_files[0] == os.path.join("L0", "ISIC_00000.jpg")


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


def _milk10k_frames(n=12, seed=3):
    rng = np.random.default_rng(seed)
    md = pd.DataFrame({
        "isic_id": [f"ISIC_{i:05d}" for i in range(n)],
        "lesion_id": [f"L{i}" for i in range(n)],
        "image_type": ["clinical: close-up" if i % 2 == 0 else "dermoscopy"
                       for i in range(n)],
        "attribution": "x", "copyright_license": "y",
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
    })
    gt = pd.DataFrame({
        "lesion_id": [f"L{i}" for i in range(n)],
        "MEL": (np.arange(n) % 4 == 0).astype(int),
        "BCC": (np.arange(n) % 4 == 1).astype(int),
        "NV": (np.arange(n) % 4 == 2).astype(int),
        "BKL": (np.arange(n) % 4 == 3).astype(int),
    })
    return md, gt


def test_milk10k_split_train_and_challenge_test(tmp_path):
    """image_type filter BEFORE merge + left-merge on lesion_id + test split
    with no ground truth (skinLesionDatasetsMILK10K.py:46-51,123-145)."""
    md, gt = _milk10k_frames()
    md_csv, gt_csv = tmp_path / "md.csv", tmp_path / "gt.csv"
    md.to_csv(md_csv, index=False)
    gt.to_csv(gt_csv, index=False)
    fz_path = str(tmp_path / "fz.json")

    train = prepare_milk10k(str(md_csv), str(gt_csv),
                            image_type="clinical: close-up",
                            type_of_problem="multiclass",
                            featurizer_path=fz_path)
    # only the 6 clinical rows survive the pre-merge filter
    assert len(train.labels) == 6
    assert set(train.class_names) <= {"MEL", "BCC", "NV", "BKL"}
    # merged label: row i (clinical rows are even i) has class i%4 one-hot
    even = np.arange(12)[::2]
    expected = np.asarray(["MEL", "BCC", "NV", "BKL"])[even % 4]
    got = np.asarray(train.class_names)[train.labels]
    np.testing.assert_array_equal(got, expected)

    # challenge test: no ground truth -> labels -1, featurizer loaded
    test = prepare_milk10k(str(md_csv), None,
                           image_type="clinical: close-up",
                           type_of_problem="multiclass",
                           featurizer_path=fz_path)
    assert (test.labels == -1).all()
    assert test.feature_dim == train.feature_dim
    # identical feature space: same rows featurize identically
    np.testing.assert_allclose(test.features, train.features, atol=1e-6)
    # per-lesion subdirectory image layout
    assert test.image_files[0] == os.path.join("L0", "ISIC_00000.jpg")

    # without a persisted featurizer the test split must refuse
    with pytest.raises(ValueError):
        prepare_milk10k(str(md_csv), None, featurizer_path=str(tmp_path / "no.json"))


def test_isic2020_multiclass_diagnosis_mode(tmp_path):
    """Diagnosis collapse map + unmapped-row drop
    (skinLesionDatasetsISIC2020.py:121-136)."""
    df = pd.DataFrame({
        "image_name": [f"img{i}" for i in range(8)],
        "patient_id": [f"P{i % 3}" for i in range(8)],
        "diagnosis": ["nevus", "melanoma", "seborrheic keratosis",
                      "lentigo NOS", "solar lentigo", "unknown",
                      "weird-unmapped", "atypical melanocytic proliferation"],
        "benign_malignant": "benign", "target": 0,
        "sex": ["male", "female"] * 4,
        "age_approx": np.arange(8) * 10.0,
        "anatom_site_general_challenge": "torso",
    })
    csv = tmp_path / "isic20.csv"
    df.to_csv(csv, index=False)
    ds = prepare_dataset("isic-2020-multiclass", str(csv))
    # the unmapped row is dropped
    assert len(ds.labels) == 7
    assert ds.class_names == ["BKL", "MEL", "NEV", "UNK"]
    got = np.asarray(ds.class_names)[ds.labels]
    np.testing.assert_array_equal(
        got, ["NEV", "MEL", "BKL", "BKL", "BKL", "UNK", "UNK"])


def test_pad25_sentinel_set(tmp_path):
    """Full PAD-25 sentinel normalization (skinLesionDatasetsPAD2025.py:113-133):
    'I'->EMPTY, 'NAO PREENCHIDO'->EMPTY, BRASIL->BRAZIL, age EMPTY->0."""
    df = pd.DataFrame({
        "img-id": [f"i{i}" for i in range(6)],
        "img-src": "CLINICAL",
        "patient-id": [f"P{i}" for i in range(6)],
        "macroCIDDiagnostic": ["C43", "D22", "C44", "L57", "L82", "C80"],
        "age": ["42", "EMPTY", "", "NAO PREENCHIDO", "33", "51"],
        "country": ["BRASIL", "BRAZIL", "NÃO  ENCONTRADO", " ", "I",
                    "NAO PREENCHIDO"],
        "smoke": ["True", "False", "I", "True", "False", "  "],
    })
    csv = tmp_path / "pad25.csv"
    df.to_csv(csv, index=False)
    ds = prepare_dataset("pad-ufes-25", str(csv))
    raw = ds.raw
    # sentinel strings all collapse to EMPTY; BRASIL normalized
    assert set(raw["country"]) == {"BRAZIL", "EMPTY"}
    assert set(raw["smoke"]) == {"True", "False", "EMPTY"}
    # age: EMPTY/missing/sentinel -> 0, numerics preserved
    np.testing.assert_array_equal(raw["age"].to_numpy(float),
                                  [42.0, 0.0, 0.0, 0.0, 33.0, 51.0])
    # labels map through the CID cluster table
    got = np.asarray(ds.class_names)[ds.labels]
    np.testing.assert_array_equal(
        got, ["MEL", "NEVO", "CEC", "ACT", "SEBO", "CBC"])
