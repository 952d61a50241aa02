from vllm_flash_attn_tpu.modules.mha import MHA, ParallelMHA  # noqa: F401
from vllm_flash_attn_tpu.modules.mlp import (  # noqa: F401
    GatedMlp,
    Mlp,
    ParallelGatedMlp,
    ParallelMLP,
)
from vllm_flash_attn_tpu.modules.block import Block  # noqa: F401
from vllm_flash_attn_tpu.modules.embedding import (  # noqa: F401
    GPT2Embeddings,
    ParallelGPT2Embeddings,
)
