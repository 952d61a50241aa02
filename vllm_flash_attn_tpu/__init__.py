"""TPU-native flash attention framework.

Re-exports the same 7-function public surface as the reference package
(/root/reference/vllm_flash_attn/__init__.py:1-12).
"""

__version__ = "0.1.0"

from vllm_flash_attn_tpu.api import (  # noqa: F401
    flash_attn_func,
    flash_attn_kvpacked_func,
    flash_attn_qkvpacked_func,
    flash_attn_varlen_func,
    flash_attn_varlen_kvpacked_func,
    flash_attn_varlen_qkvpacked_func,
    flash_attn_with_kvcache,
)
