from .config import (
    Config,
    DecoderConfig,
    EncoderConfig,
    LSTMConfig,
    ModelConfig,
    TransformerConfig,
    register_config,
)
from .gan import (
    DiscriminatorConfig,
    GANConfig,
    GeneratorConfig,
    generate_tokens,
    init_gan_params,
    make_discriminator,
    make_generator,
)
from .vae import StyleVAE, VAEDecoder, VAEEncoder, init_params, make_model

__all__ = [
    "DiscriminatorConfig",
    "GANConfig",
    "GeneratorConfig",
    "generate_tokens",
    "init_gan_params",
    "make_discriminator",
    "make_generator",
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
