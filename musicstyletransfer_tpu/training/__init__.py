from .checkpoint import (
    TrainingProgress,
    get_latest_checkpoint_index,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
    try_latest,
)
from .loss import binary_cross_entropy, kl_divergence, masked_cross_entropy, vae_loss
from .metrics import MetricAccumulator, step_metrics
from .optimizer import OptimizerConfig, build_optimizer
from .train_step import (
    LossConfig,
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    shard_train_state,
)
from .gan_trainer import GANTrainConfig, GANTrainer, make_gan_steps
from .trainer import TrainConfig, Trainer

__all__ = [
    "GANTrainConfig",
    "GANTrainer",
    "make_gan_steps",
    "TrainingProgress",
    "get_latest_checkpoint_index",
    "restore_checkpoint",
    "restore_params",
    "save_checkpoint",
    "try_latest",
    "binary_cross_entropy",
    "kl_divergence",
    "masked_cross_entropy",
    "vae_loss",
    "MetricAccumulator",
    "step_metrics",
    "OptimizerConfig",
    "build_optimizer",
    "LossConfig",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "shard_train_state",
    "TrainConfig",
    "Trainer",
]
