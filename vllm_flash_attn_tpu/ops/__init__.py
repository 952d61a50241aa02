from vllm_flash_attn_tpu.ops.layer_norm import (  # noqa: F401
    dropout_add_layer_norm,
    dropout_add_rms_norm,
    layer_norm,
    rms_norm,
)
from vllm_flash_attn_tpu.ops.cross_entropy import cross_entropy_loss  # noqa: F401
