from .config import (
    Config,
    DecoderConfig,
    EncoderConfig,
    LSTMConfig,
    ModelConfig,
    TransformerConfig,
    register_config,
)
from .vae import StyleVAE, VAEDecoder, VAEEncoder, init_params, make_model

__all__ = [
    "Config",
    "DecoderConfig",
    "EncoderConfig",
    "LSTMConfig",
    "ModelConfig",
    "TransformerConfig",
    "register_config",
    "StyleVAE",
    "VAEDecoder",
    "VAEEncoder",
    "init_params",
    "make_model",
]
