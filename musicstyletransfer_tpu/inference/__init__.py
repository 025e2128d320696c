from .decode import beam_search, decode_beam, decode_sampled, sample_sequences
from .sampler import BeamSearchSampler, Sampling, SamplerBase, get_sampler, load_inference_model

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
]
