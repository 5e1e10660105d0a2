from ishapediting_tpu.train.trainer import TrainState, make_train_step  # noqa: F401
