from vllm_flash_attn_tpu.core.reference import attention_ref  # noqa: F401
