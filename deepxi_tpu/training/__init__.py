"""L4 trainer/checkpointing (ref: deepxi/model.py train paths)."""

from deepxi_tpu.training.trainer import (
    TrainState,
    append_loss_csv,
    make_eval_step,
    make_optimizer,
    make_phoneme_train_step,
    make_train_step,
    masked_loss,
    restore_checkpoint,
    save_checkpoint,
    transformer_schedule,
)

__all__ = ["TrainState", "append_loss_csv", "make_eval_step", "make_optimizer", "make_phoneme_train_step",
           "make_train_step", "masked_loss", "restore_checkpoint",
           "save_checkpoint", "transformer_schedule"]
