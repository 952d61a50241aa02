from vllm_flash_attn_tpu.models.gpt import (  # noqa: F401
    GPTConfig,
    GPTLMHeadModel,
    combine_state_dicts_tp,
    shard_state_dict_tp,
)
