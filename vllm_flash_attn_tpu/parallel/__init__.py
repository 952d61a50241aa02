from vllm_flash_attn_tpu.parallel.mesh import make_mesh, initialize_multihost  # noqa: F401
from vllm_flash_attn_tpu.parallel.attention import (  # noqa: F401
    sharded_flash_attention,
    sharded_paged_attention,
)
