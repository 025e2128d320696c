from .flash_attention import flash_attention, reference_attention, should_interpret

__all__ = ["flash_attention", "reference_attention", "should_interpret"]
