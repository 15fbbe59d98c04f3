"""Cross-framework checkpoint import: a reference-framework torch checkpoint
(projector + LoRA state dicts, reference src/train.py:102-131) must load into
our trainable pytree and be functionally identical (projector outputs, LoRA
deltas) to the torch modules that produced it."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from audio_llama_tpu.config import AudioLLMConfig, LlamaConfig, LoraConfig, WhisperConfig
from audio_llama_tpu.models import allm, lora as lora_mod, projector as proj_mod
from audio_llama_tpu.training import checkpoint as ckpt


def _cfg():
    return AudioLLMConfig(
        llama=LlamaConfig(
            vocab_size=256, hidden_size=32, intermediate_size=64,
            num_layers=3, num_heads=4, num_kv_heads=2, head_dim=8,
        ),
        whisper=WhisperConfig(
            d_model=16, num_layers=1, num_heads=2, ffn_dim=32,
            num_mel_bins=80, max_source_positions=50,
        ),
        lora=LoraConfig(rank=4, alpha=16),
    )


def _torch_projector(in_dim, out_dim):
    """Reference AudioProjector (src/models/projector.py:5-19)."""
    hid = (in_dim + out_dim) // 2
    return torch.nn.Sequential(
        torch.nn.Linear(in_dim, hid),
        torch.nn.GELU(),
        torch.nn.Linear(hid, out_dim),
        torch.nn.LayerNorm(out_dim),
    )


class _TorchLoRA(torch.nn.Module):
    """Reference LoRALayer (src/models/lora.py:6-21)."""

    def __init__(self, in_dim, out_dim, rank, alpha):
        super().__init__()
        self.lora_A = torch.nn.Parameter(torch.randn(rank, in_dim) * 0.05)
        self.lora_B = torch.nn.Parameter(torch.randn(out_dim, rank) * 0.05)
        self.scaling = alpha / rank

    def forward(self, x):
        return (x @ (self.lora_B @ self.lora_A).T) * self.scaling


def _make_ref_checkpoint(cfg, tmp_path, layout="full"):
    torch.manual_seed(0)
    D, F = cfg.llama.hidden_size, cfg.llama.intermediate_size
    L, r, alpha = cfg.llama.num_layers, cfg.lora.rank, cfg.lora.alpha
    proj = _torch_projector(cfg.whisper.d_model, D)
    dims = {
        "q_proj": (D, cfg.llama.num_heads * cfg.llama.head_dim),
        "k_proj": (D, cfg.llama.num_kv_heads * cfg.llama.head_dim),
        "v_proj": (D, cfg.llama.num_kv_heads * cfg.llama.head_dim),
        "gate_proj": (D, F),
        "up_proj": (D, F),
        "down_proj": (F, D),
    }
    loras = {}
    for i in range(L):
        for t, (di, do) in dims.items():
            sub = "self_attn" if t.endswith(("q_proj", "k_proj", "v_proj")) else "mlp"
            loras[f"model.layers.{i}.{sub}.{t}"] = _TorchLoRA(di, do, r, alpha)
    # The reference assigns its Sequential to self.layers, so its
    # state_dict keys read 'layers.0.weight' etc.; our bare Sequential's
    # keys are '0.weight' — add the prefix.
    model_sd = {
        "projector": {f"layers.{k}": v for k, v in proj.state_dict().items()},
        "lora_layers": {n: m.state_dict() for n, m in loras.items()},
    }
    if layout == "full":
        payload = {"model": model_sd, "optimizer": {}, "scheduler": None,
                   "step": 123, "epoch": 2, "args": {"lora_rank": r}}
    else:
        payload = model_sd
    d = tmp_path / f"checkpoint-{layout}"
    d.mkdir()
    torch.save(payload, str(d / "checkpoint.pt"))
    return str(d), proj, loras


@pytest.mark.parametrize("layout", ["full", "bare"])
def test_reference_checkpoint_roundtrip(tmp_path, layout):
    cfg = _cfg()
    template = jax.device_get(allm.init_trainable(cfg, jax.random.PRNGKey(0)))
    path, proj, loras = _make_ref_checkpoint(cfg, tmp_path, layout)

    trainable, opt, step, epoch = ckpt.load_checkpoint(
        path, trainable_template=template
    )
    assert opt is None
    if layout == "full":
        assert (step, epoch) == (123, 2)

    # Projector functional parity vs the torch module that wrote it.
    x = np.random.RandomState(0).randn(2, 5, cfg.whisper.d_model).astype(np.float32)
    ours = np.asarray(
        proj_mod.project(
            jax.tree.map(jnp.asarray, trainable["projector"]),
            jnp.asarray(x), compute_dtype=jnp.float32,
        )
    )
    with torch.no_grad():
        theirs = proj(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    # LoRA delta parity per layer/target: x @ (B@A).T * scaling.
    scaled = lora_mod.with_scaling(trainable["lora"], cfg.lora)
    xs = np.random.RandomState(1)
    for name, tmod in loras.items():
        target = name.split(".")[-1]
        layer = int(name.split(".")[2])
        br = scaled["layers"][target]
        di = br["a"].shape[1]
        v = xs.randn(3, di).astype(np.float32)
        ours = (v @ np.asarray(br["a"][layer])) @ np.asarray(br["b"][layer])
        ours = ours * scaled["scaling"]
        with torch.no_grad():
            theirs = tmod(torch.from_numpy(v)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_reference_checkpoint_shape_mismatch(tmp_path):
    cfg = _cfg()
    template = jax.device_get(allm.init_trainable(cfg, jax.random.PRNGKey(0)))
    # Write a checkpoint at the WRONG rank -> loader must refuse loudly.
    bad = cfg.replace(lora=LoraConfig(rank=8, alpha=16))
    path, _, _ = _make_ref_checkpoint(bad, tmp_path, "full")
    with pytest.raises(ValueError, match="rank or model dims mismatch"):
        ckpt.load_checkpoint(path, trainable_template=template)


def test_inference_cli_loads_reference_pt(tmp_path):
    """VERDICT item 5 acceptance: --checkpoint_path <ref .pt> works through
    the inference bootstrap (load_audio_llm)."""
    from audio_llama_tpu.inference.cli import load_audio_llm

    cfg = AudioLLMConfig.tiny()
    path, proj, _ = _make_ref_checkpoint(cfg, tmp_path, "full")
    pt_file = os.path.join(path, "checkpoint.pt")

    got_cfg, frozen, trainable, tk = load_audio_llm(pt_file, toy_model=True)
    # Imported (not freshly initialized) projector: matches the torch module.
    w = np.asarray(trainable["projector"]["fc1"]["w"])
    np.testing.assert_allclose(
        w, proj[0].weight.detach().numpy().T, rtol=1e-5, atol=1e-6
    )
