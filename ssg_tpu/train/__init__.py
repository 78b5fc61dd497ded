from ssg_tpu.train.trainer import Trainer, TrainState, create_train_state, make_train_step
