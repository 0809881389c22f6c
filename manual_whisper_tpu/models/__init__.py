from .whisper import (MODEL_CONFIGS, WhisperConfig, encode, decoder_forward,
                      decode_step, init_params, init_kv_cache,
                      precompute_cross_kv, sinusoids, unstack_cross_kv,
                      unstack_decoder)

__all__ = ["MODEL_CONFIGS", "WhisperConfig", "encode", "decoder_forward",
           "decode_step", "init_params", "init_kv_cache",
           "precompute_cross_kv", "sinusoids", "unstack_cross_kv",
           "unstack_decoder"]
