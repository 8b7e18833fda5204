"""Training / sampling pipelines, EMA, train state, checkpointing."""

from diffma_tpu.train.state import TrainState, make_train_step, update_ema  # noqa: F401
