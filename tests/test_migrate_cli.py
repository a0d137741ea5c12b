"""End-to-end migration: synthesized reference .pth + sklearn pickles →
skinjax orbax checkpoint + JSON featurizer → serving engine."""

import json
import os
import pickle

import numpy as np
import torch

from tests.test_full_model_parity import TorchMM, _torch_state_dict


def test_migrate_cli_end_to_end(tmp_path):
    from sklearn.preprocessing import LabelEncoder as SkLE
    from sklearn.preprocessing import OneHotEncoder as SkOHE
    from sklearn.preprocessing import StandardScaler as SkScaler

    # reference-side artifacts: a state_dict + fitted sklearn pickles
    torch.manual_seed(7)
    tm = TorchMM("concatenation").eval()
    sd = {k: torch.tensor(v) for k, v in _torch_state_dict(tm).items()}
    pth = str(tmp_path / "model.pth")
    torch.save(sd, pth)

    rng = np.random.default_rng(0)
    cats = rng.choice(["ARM", "FACE", "NECK"], size=(60, 2)).astype(object)
    nums = rng.normal(50, 20, size=(60, 1))
    ohe = SkOHE(sparse_output=False, handle_unknown="ignore").fit(cats)
    scaler = SkScaler().fit(nums)
    le = SkLE().fit(rng.choice(["ACK", "BCC", "MEL", "NEV", "SCC", "SEK"], 60))
    paths = {}
    for name, obj in [("ohe", ohe), ("scaler", scaler), ("le", le)]:
        paths[name] = str(tmp_path / f"{name}.pickle")
        with open(paths[name], "wb") as f:
            pickle.dump(obj, f)

    out = str(tmp_path / "migrated")
    from skinjax.tools.migrate_cli import main

    main([
        "--state-dict", pth, "--backbone", "resnet-18", "--common-dim", "32",
        "--mechanism", "concatenation", "--num-heads", "4",
        "--num-classes", "6",
        "--ohe-pickle", paths["ohe"], "--scaler-pickle", paths["scaler"],
        "--label-pickle", paths["le"],
        "--categorical-cols", "region", "itch",
        "--numerical-cols", "age",
        "--out", out,
    ])
    assert os.path.exists(os.path.join(out, "featurizer.json"))
    assert os.path.exists(os.path.join(out, "model_config.json"))
    assert os.path.isdir(os.path.join(out, "params"))

    with open(os.path.join(out, "model_config.json")) as f:
        cfg = json.load(f)
    assert cfg["num_classes"] == 6 and cfg["backbone"] == "resnet-18"

    # featurizer round-trip: sklearn-pickle feature space reproduced
    from skinjax.data.featurizer import MetadataFeaturizer

    fz = MetadataFeaturizer.load(os.path.join(out, "featurizer.json"))
    table = {"region": np.array(["ARM", "MARS"], dtype=object),
             "itch": np.array(["FACE", "NECK"], dtype=object),
             "age": np.array([30.0, 70.0])}
    ours = fz.transform(table)
    ref_cat = ohe.transform(np.stack([table["region"], table["itch"]], axis=1))
    ref_num = scaler.transform(table["age"][:, None])
    np.testing.assert_allclose(ours, np.hstack([ref_cat, ref_num]), atol=1e-6)
    assert fz.label_encoder.classes == list(le.classes_)
