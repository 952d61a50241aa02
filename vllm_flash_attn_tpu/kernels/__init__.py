from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention  # noqa: F401
