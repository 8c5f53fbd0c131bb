from .trainer import (TrainState, create_train_state, make_train_step,
                      make_eval_step, make_mesh, shard_batch, lr_schedule)
