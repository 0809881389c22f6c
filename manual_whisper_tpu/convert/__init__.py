from .from_hf import (convert_whisper_state_dict, hf_config_to_whisper_config,
                      load_whisper_checkpoint, save_params, load_params)

__all__ = ["convert_whisper_state_dict", "hf_config_to_whisper_config",
           "load_whisper_checkpoint", "save_params", "load_params"]
