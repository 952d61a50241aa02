from vllm_flash_attn_tpu.training.train_step import (  # noqa: F401
    TrainState,
    make_optimizer,
    make_parallel_train_step,
)
