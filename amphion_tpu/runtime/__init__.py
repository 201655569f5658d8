from amphion_tpu.runtime.train_state import TrainState, create_train_state
