from vllm_flash_attn_tpu.layers.rotary import (  # noqa: F401
    RotaryEmbedding,
    apply_rotary_emb,
)
