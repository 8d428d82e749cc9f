"""Training pipeline: schedules, dual optimizer, train state and steps."""

from vibertgrid_tpu.train.schedules import cosine_scheduler, step_scheduler  # noqa: F401
from vibertgrid_tpu.train.optim import make_optimizer  # noqa: F401
from vibertgrid_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
