from vllm_flash_attn_tpu.utils.padding import (  # noqa: F401
    pad_input,
    unpad_input,
    generate_cu_seqlens,
)
