"""Object-style convenience facade over the functional core.

The reference exposes a torch `AudioLLM` nn.Module with .forward/.generate/
.get_trainable_params/.to (reference src/models/allm.py:8-348). The TPU-native
core is pure functions over pytrees (models/allm.py) — this facade binds
(config, frozen, trainable, tokenizer) into one object with the familiar
method surface, for users migrating from the reference. All methods delegate
to the jitted functional paths; the object holds no other state.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import AudioLLMConfig


class AudioLLM:
    """Bound model: config + frozen/trainable pytrees + tokenizer."""

    def __init__(self, cfg: AudioLLMConfig, frozen: dict, trainable: dict, tokenizer):
        self.cfg = cfg
        self.frozen = frozen
        self.trainable = trainable
        self.tokenizer = tokenizer

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        llama_path: str,
        whisper_path: str,
        tokenizer: Optional[str] = None,
        lora=None,
        seed: int = 0,
    ) -> "AudioLLM":
        """Load frozen bases from local HF checkpoints and init fresh
        trainables (reference AudioLLM.__init__, src/models/allm.py:8-45)."""
        import jax

        from ..data.tokenizer import load_tokenizer
        from . import allm, hf_loader, llama as llama_mod

        tk = load_tokenizer(tokenizer or llama_path)
        llama_params, llama_cfg = hf_loader.load_llama(llama_path)
        whisper_params, whisper_cfg = hf_loader.load_whisper_encoder(whisper_path)
        llama_params = llama_mod.resize_embeddings(llama_params, tk.vocab_size, llama_cfg)
        llama_cfg = llama_cfg.replace(vocab_size=max(llama_cfg.vocab_size, tk.vocab_size))
        from ..config import LoraConfig, MelConfig

        cfg = AudioLLMConfig(
            llama=llama_cfg,
            whisper=whisper_cfg,
            mel=MelConfig(num_mel_bins=whisper_cfg.num_mel_bins),
            lora=lora if lora is not None else LoraConfig(),
        )
        trainable = allm.init_trainable(cfg, jax.random.PRNGKey(seed))
        return cls(cfg, {"llama": llama_params, "whisper": whisper_params}, trainable, tk)

    @classmethod
    def from_checkpoint(cls, checkpoint_path: str, **kw) -> "AudioLLM":
        """Restore trainables (and config) from a training checkpoint
        (reference load_audio_llm, src/inference.py:13-76)."""
        from ..inference.cli import load_audio_llm

        cfg, frozen, trainable, tk = load_audio_llm(checkpoint_path, **kw)
        return cls(cfg, frozen, trainable, tk)

    # -- reference method surface -------------------------------------------

    @property
    def audio_start_id(self) -> int:
        return self.tokenizer.token_to_id(self.cfg.audio_start_token)

    @property
    def audio_end_id(self) -> int:
        return self.tokenizer.token_to_id(self.cfg.audio_end_token)

    def forward(self, batch, compute_dtype=None):
        """(loss, logits) on an AudioLLMBatch (reference AudioLLM.forward,
        src/models/allm.py:47-106)."""
        import jax.numpy as jnp

        from . import allm

        return allm.forward(
            self.frozen, self.trainable, self.cfg, batch,
            self.audio_start_id, self.audio_end_id,
            compute_dtype or jnp.bfloat16,
        )

    __call__ = forward

    def generate(
        self,
        prompt: str,
        audio_path: Optional[str] = None,
        max_new_tokens: int = 256,
        temperature: float = 0.7,
        top_p: float = 0.9,
        greedy: bool = False,
        seed: int = 0,
        kv_quant=False,
        draft=None,
        gamma: int = 4,
    ) -> str:
        """Prompt (+ optional audio file) -> generated text (reference
        AudioLLM.generate, src/models/allm.py:263-348, with the prompt-strip
        already handled). kv_quant: quantized KV cache — True/8 = int8
        rows, 4 = nibble-packed int4 rows (pairs with quantize_decoder()
        for max decode throughput). draft: a (params,
        LlamaConfig) pair or a path for inference.cli.load_draft_llama —
        switches to speculative draft-and-verify decoding (same output
        distribution, fewer target forwards)."""
        from ..inference.cli import generate_response, load_draft_llama

        if isinstance(draft, str):
            draft = load_draft_llama(draft, self.cfg.llama.vocab_size, seed)
        return generate_response(
            self.cfg, self.frozen, self.trainable, self.tokenizer,
            prompt=prompt, audio_path=audio_path,
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, greedy=greedy, seed=seed, kv_quant=kv_quant,
            draft=draft, gamma=gamma,
        )

    def get_trainable_params(self) -> dict:
        """The trainable pytree — projector + LoRA only (reference
        src/models/allm.py:244-249)."""
        return self.trainable

    def num_trainable_params(self) -> int:
        from . import allm

        return allm.num_trainable_params(self.trainable)

    def to_mesh(self, mesh) -> "AudioLLM":
        """Shard the frozen stacks over a device mesh (the TPU analog of the
        reference's .to(device), src/models/allm.py:251-260)."""
        from ..parallel import sharding

        return AudioLLM(
            self.cfg,
            sharding.shard_frozen(mesh, self.frozen),
            sharding.shard_trainable(mesh, self.trainable),
            self.tokenizer,
        )

    def quantize_encoder(self, calib_audio=None, alpha: float = 0.5) -> "AudioLLM":
        """W8A8 int8 encoder for serving throughput; the audio path
        auto-dispatches on the quantized param layout.

        calib_audio: waveform batch [B, S] (or [S]) of representative audio
        — enables SmoothQuant activation smoothing, REQUIRED for real
        checkpoints (naive W8A8 loses 12-57% encoder accuracy at realistic
        outlier-channel magnitudes; experiments/int8_outlier_probe.py).
        None quantizes unsmoothed (A/B / toy use only)."""
        import jax.numpy as jnp

        from . import whisper_int8 as w8

        frozen = dict(self.frozen)
        if calib_audio is not None:
            import jax

            from ..ops import mel as mel_ops

            a = jnp.asarray(calib_audio, jnp.float32)
            if a.ndim == 1:
                a = a[None]
            mel = jax.jit(lambda x: mel_ops.log_mel(x, self.cfg.mel))(a)
            frozen["whisper"] = w8.quantize_encoder_smoothed(
                frozen["whisper"], self.cfg.whisper, mel, alpha=alpha
            )
        else:
            frozen["whisper"] = w8.quantize_encoder(frozen["whisper"])
        return AudioLLM(self.cfg, frozen, self.trainable, self.tokenizer)

    def quantize_decoder(
        self, include_embed: bool = True, bits: int = 8, tp: int = 1,
        rotate: bool | None = None, rotate_key=None, fmt: str | None = None,
    ) -> "AudioLLM":
        """Weight-only quantized frozen Llama for decode serving — bits=8
        (W8A16, models/llama_int8.py) halves the per-step HBM weight stream
        that bounds decode throughput; bits=4 (W4A16, models/llama_int4.py,
        Pallas dequant kernel) halves it again.

        rotate (default None = AUTO: on for bits=4, off for bits=8): apply
        the exact QuaRot residual-stream rotation before quantizing
        (models/llama_rotate.py) — spreads outlier channels across scale
        groups. Outlier-regime logit-KL gate (experiments/
        int4_rotate_gate.py + _gate2.py): plain clipped-RTN 0.376 fails
        the 0.2 serving bar; rotate+RTN 0.197 and rotate+GPTQ+clip 0.123
        pass it — rotation is what makes int4 decode honest, hence the
        auto default. int8's unrotated KL is already 0.034, so bits=8
        skips the two [*, D] @ [D, D] sandwich matmuls per step. Any LoRA
        overlay in trainable is transformed alongside; for zero-overhead
        serving call merge_lora() FIRST (merging needs bf16 weights)."""
        import jax as _jax

        frozen = dict(self.frozen)
        trainable = self.trainable
        llama_tree = frozen["llama"]
        if rotate is None:
            rotate = bits == 4
        if rotate:
            from . import llama_rotate as rt

            key = rotate_key if rotate_key is not None else _jax.random.PRNGKey(7)
            if "lora" in trainable:
                llama_tree, lora_rot = rt.rotate_llama(
                    llama_tree, self.cfg.llama, key, lora=trainable["lora"]
                )
                trainable = dict(trainable)
                trainable["lora"] = lora_rot
            else:
                llama_tree = rt.rotate_llama(llama_tree, self.cfg.llama, key)
        if bits == 4:
            from . import llama_int4 as l4
            from ..ops import int4_matmul as _i4

            frozen["llama"] = l4.quantize_llama_int4(
                llama_tree, include_embed=include_embed, tp=tp, fmt=fmt,
                # toy dims: hidden < the flagship 128-row scale group
                group=min(_i4.GROUP, self.cfg.llama.hidden_size),
            )
        elif bits == 8:
            from . import llama_int8 as l8

            frozen["llama"] = l8.quantize_llama(
                llama_tree, include_embed=include_embed
            )
        else:
            raise ValueError(f"bits must be 4 or 8, got {bits}")
        return AudioLLM(self.cfg, frozen, trainable, self.tokenizer)

    def merge_lora(self) -> "AudioLLM":
        """Fold LoRA deltas into the frozen weights for zero-overhead decode
        (no reference analog; see models/lora.py:merge_into_llama)."""
        from . import lora as lora_mod

        if self.cfg.lora is None or "lora" not in self.trainable:
            return self
        merged = dict(self.frozen)
        merged["llama"] = lora_mod.merge_into_llama(
            self.frozen["llama"],
            lora_mod.with_scaling(self.trainable["lora"], self.cfg.lora),
        )
        trainable = {k: v for k, v in self.trainable.items() if k != "lora"}
        return AudioLLM(
            self.cfg.replace(lora=None), merged, trainable, self.tokenizer
        )
