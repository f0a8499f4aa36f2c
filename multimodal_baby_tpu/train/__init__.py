from multimodal_baby_tpu.train.optimizer import (
    build_optimizer, frozen_mask, ReduceLROnPlateau,
    set_learning_rate, get_learning_rate)
from multimodal_baby_tpu.train.step import (
    TrainState, init_train_state, make_loss_fn, make_train_step,
    make_eval_step)
