from vllm_flash_attn_tpu.serving.page_allocator import PageAllocator  # noqa: F401
from vllm_flash_attn_tpu.serving.engine import LLMEngine, Request  # noqa: F401
