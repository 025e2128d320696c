from .decode import beam_search, decode_beam, decode_sampled, sample_sequences
from .sampler import BeamSearchSampler, Sampling, SamplerBase, get_sampler, load_inference_model
from .service import ServiceStats, StyleTransferService, TransferResult
from .streaming import StreamingTransferEngine
from .sharded import (
    prepare_params,
    sharded_sample_sequences,
    sharded_style_transfer_all_classes,
)

__all__ = [
    "beam_search",
    "decode_beam",
    "decode_sampled",
    "sample_sequences",
    "BeamSearchSampler",
    "Sampling",
    "SamplerBase",
    "get_sampler",
    "load_inference_model",
    "ServiceStats",
    "StreamingTransferEngine",
    "StyleTransferService",
    "TransferResult",
    "prepare_params",
    "sharded_sample_sequences",
    "sharded_style_transfer_all_classes",
]
