"""TabTransformer path end-to-end: featurizer vocab → index encoding →
TabularSource → MultimodalModel(tab tower) → train_process."""

import numpy as np
import pandas as pd

import jax


def test_index_encode_and_cardinalities():
    from skinjax.data.featurizer import MetadataFeaturizer
    from skinjax.data.tabular import cardinalities, index_encode

    fz = MetadataFeaturizer(categorical_cols=["region", "itch"],
                            numerical_cols=["age"])
    fz.ohe.categories = [["ARM", "FACE"], ["False", "True"]]
    fz.scaler.mean = np.array([50.0])
    fz.scaler.scale = np.array([10.0])
    table = {
        "region": np.array(["FACE", "ARM", "MARS"], dtype=object),
        "itch": np.array(["True", "False", "True"], dtype=object),
        "age": np.array([60.0, 40.0, 50.0]),
    }
    cats, nums = index_encode(fz, table)
    np.testing.assert_array_equal(cats[:, 0], [1, 0, 2])  # MARS -> unknown=2
    np.testing.assert_array_equal(cats[:, 1], [1, 0, 1])
    np.testing.assert_allclose(nums[:, 0], [1.0, -1.0, 0.0])
    assert cardinalities(fz) == (3, 3)


def test_tab_transformer_training_end_to_end(tmp_path):
    from skinjax.data.schemas import prepare_dataset
    from skinjax.data.tabular import TabularSource, cardinalities
    from skinjax.models import MultimodalModel
    from skinjax.models.text import TabTransformer
    from skinjax.train import TrainConfig, train_process
    from skinjax.train.kfold import SubsetSource

    rng = np.random.default_rng(0)
    n = 40
    df = pd.DataFrame({
        "patient_id": [f"P{i % 10}" for i in range(n)],
        "lesion_id": np.arange(n), "img_id": [f"i{i}.png" for i in range(n)],
        "biopsed": "True",
        "diagnostic": [["ACK", "BCC", "MEL"][i % 3] for i in range(n)],
        "smoke": rng.choice(["True", "False"], n),
        "region": rng.choice(["ARM", "FACE"], n),
        "age": rng.integers(20, 90, n),
        "diameter_1": rng.uniform(1, 9, n),
        "diameter_2": rng.uniform(1, 9, n),
    })
    csv = tmp_path / "m.csv"
    df.to_csv(csv, index=False)
    prepared = prepare_dataset("pad-ufes-20", str(csv))

    images = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    src = TabularSource.from_prepared(prepared, images)
    assert src.categorical.shape == (n, len(prepared.featurizer.categorical_cols))

    tower = TabTransformer(
        categorical_cardinalities=cardinalities(prepared.featurizer),
        num_continuous=len(prepared.featurizer.numerical_cols),
        embed_dim=8, num_heads=2, num_layers=1, hidden_dim=16, out_dim=32,
    )
    model = MultimodalModel(
        num_classes=3, num_heads=4, cnn_model_name="custom-cnn", common_dim=32,
        text_encoder_dim_output=32, text_model_name="tab-transformer",
        text_module=tower, text_input_mode="tabular",
        attention_mechanism="crossattention",
    )
    train = SubsetSource(src, np.arange(32))
    val = SubsetSource(src, np.arange(32, 40))
    state, metrics, history = train_process(
        model, train, val, num_classes=3,
        config=TrainConfig(num_epochs=2, batch_size=8, image_dtype="float32",
                           augment=False),
    )
    assert np.isfinite(history["train_loss"]).all()
    assert np.isfinite(metrics["balanced_accuracy"])


def test_static_embedding_tower_training():
    """PubMedBERT-style precomputed sentence embeddings path
    (skinLesionDatasetsWithPubMedEmbeddings.py): embeddings ride as the
    metadata features through the static-embedding tower."""
    from skinjax.data.pipeline import ArraySource
    from skinjax.models import MultimodalModel
    from skinjax.train import TrainConfig, train_process
    from skinjax.train.kfold import SubsetSource

    rng = np.random.default_rng(1)
    n, emb_dim, ncls = 40, 24, 3
    labels = rng.integers(0, ncls, n).astype(np.int32)
    embeddings = rng.normal(size=(n, emb_dim)).astype(np.float32)
    embeddings[np.arange(n), labels] += 2.0  # class signal in the embedding
    images = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    src = ArraySource(images, embeddings, labels)

    model = MultimodalModel(
        num_classes=ncls, num_heads=4, cnn_model_name="custom-cnn",
        common_dim=32, text_encoder_dim_output=32,
        text_model_name="static-embedding",
        attention_mechanism="concatenation",
    )
    train = SubsetSource(src, np.arange(32))
    val = SubsetSource(src, np.arange(32, 40))
    state, metrics, history = train_process(
        model, train, val, num_classes=ncls,
        config=TrainConfig(num_epochs=2, batch_size=8, learning_rate=1e-3,
                           image_dtype="float32", augment=False),
    )
    assert np.isfinite(history["train_loss"]).all()
    assert history["train_loss"][-1] < history["train_loss"][0]
