from .flash_attention import (
    flash_attention,
    flash_attention_with_lse,
    reference_attention,
    should_interpret,
)
from .ring_attention import ring_attention_sharded, ring_flash_attention

__all__ = [
    "flash_attention",
    "flash_attention_with_lse",
    "reference_attention",
    "ring_attention_sharded",
    "ring_flash_attention",
    "should_interpret",
]
