"""Drop-in import-path alias for the reference's `flash_attn.bert_padding`
(pad_input / unpad_input surface; implementation in utils/padding.py)."""

from vllm_flash_attn_tpu.utils.padding import (  # noqa: F401
    generate_cu_seqlens,
    pad_input,
    unpad_input,
)
