"""Data layer: featurizer, dataset schemas, CV splits, sampling, on-device
augmentation, host input pipeline."""

from skinjax.data.augment import augment_batch
from skinjax.data.featurizer import (
    LabelEncoder,
    MetadataFeaturizer,
    OneHotEncoder,
    StandardScaler,
)
from skinjax.data.pipeline import (
    ArraySource,
    FileSource,
    ImageStore,
    prefetch_batches,
    synthetic_source,
)
from skinjax.data.sampling import (
    compute_class_weights,
    epoch_batches,
    weighted_sample_indices,
)
from skinjax.data.schemas import SPECS, PreparedDataset, prepare_dataset
from skinjax.data.splits import (
    stratified_group_kfold,
    stratified_kfold,
    train_val_split,
)

__all__ = [
    "augment_batch",
    "LabelEncoder",
    "MetadataFeaturizer",
    "OneHotEncoder",
    "StandardScaler",
    "ArraySource",
    "FileSource",
    "ImageStore",
    "prefetch_batches",
    "synthetic_source",
    "compute_class_weights",
    "epoch_batches",
    "weighted_sample_indices",
    "SPECS",
    "PreparedDataset",
    "prepare_dataset",
    "stratified_group_kfold",
    "stratified_kfold",
    "train_val_split",
]
