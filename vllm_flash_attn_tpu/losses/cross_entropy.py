"""Drop-in import-path alias for the reference's
`flash_attn.losses.cross_entropy` (implementation in ops/cross_entropy.py)."""

from vllm_flash_attn_tpu.ops.cross_entropy import (  # noqa: F401
    CrossEntropyLoss,
    cross_entropy_loss,
)
