"""L4 training layer."""

from nerfds_tpu.training import losses, schedules  # noqa: F401
from nerfds_tpu.training.step import (TrainState, build_schedules,  # noqa: F401
                                      eval_schedules, make_fused_train_step,
                                      make_loss_fn, make_train_step)
