"""Training layer: losses, metrics, optimizer/schedule, steps, loop, k-fold."""

from skinjax.train.early_stopping import EarlyStopping
from skinjax.train.kfold import SubsetSource, run_kfold
from skinjax.train.loop import TrainConfig, evaluate, train_process
from skinjax.train.losses import (
    cross_entropy,
    focal_loss,
    make_loss_fn,
    soft_target_cross_entropy,
)
from skinjax.train.metrics import classification_metrics, confusion_matrix, roc_auc
from skinjax.train.optimizer import (
    PlateauScheduler,
    make_optimizer,
    set_learning_rate,
    trainable_mask,
)
from skinjax.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "EarlyStopping",
    "SubsetSource",
    "run_kfold",
    "TrainConfig",
    "evaluate",
    "train_process",
    "cross_entropy",
    "focal_loss",
    "make_loss_fn",
    "soft_target_cross_entropy",
    "classification_metrics",
    "confusion_matrix",
    "roc_auc",
    "PlateauScheduler",
    "make_optimizer",
    "set_learning_rate",
    "trainable_mask",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
]
