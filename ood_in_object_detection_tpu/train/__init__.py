from .loss import detection_loss, LossBreakdown, ciou, df_loss  # noqa: F401
from .tal import assign, AssignResult  # noqa: F401
from .trainer import (  # noqa: F401
    TrainConfig,
    TrainState,
    init_state,
    make_sharded_train_step,
    shard_state,
    train_step,
)
