"""Helpers to build tiny random HF torch models as golden references.

These run fully offline (random weights, no network) and give bit-meaningful
parity targets for our JAX implementations — the TPU-native analog of the
reference's mock-based test strategy (SURVEY.md §4), but stronger: real
numerics instead of MagicMocks.
"""

import numpy as np
import torch


def tiny_hf_llama(cfg, seed=0):
    """Instantiate an HF LlamaForCausalLM matching our LlamaConfig."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    rs = None
    if cfg.rope_scaling is not None:
        rs = {
            "rope_type": cfg.rope_scaling.rope_type,
            "factor": cfg.rope_scaling.factor,
            "low_freq_factor": cfg.rope_scaling.low_freq_factor,
            "high_freq_factor": cfg.rope_scaling.high_freq_factor,
            "original_max_position_embeddings": cfg.rope_scaling.original_max_position_embeddings,
        }
    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        rope_scaling=rs,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_bias=cfg.attention_bias,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


def tiny_hf_whisper(cfg, seed=0):
    """Instantiate an HF WhisperModel whose encoder matches our WhisperConfig."""
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperModel

    hf_cfg = HFWhisperConfig(
        vocab_size=128,
        d_model=cfg.d_model,
        encoder_layers=cfg.num_layers,
        encoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.ffn_dim,
        decoder_layers=1,
        decoder_attention_heads=cfg.num_heads,
        decoder_ffn_dim=cfg.ffn_dim,
        num_mel_bins=cfg.num_mel_bins,
        max_source_positions=cfg.max_source_positions,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    model = WhisperModel(hf_cfg)
    model.eval()
    return model


def state_dict_numpy(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
