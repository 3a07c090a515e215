from .mesh import (  # noqa: F401
    make_mesh, replicate, shard_batch, make_train_step, make_lr_schedule,
    TrainState, init_train_state, make_predict_step,
)
