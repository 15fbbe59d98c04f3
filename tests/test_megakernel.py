"""Layer-fused B1 decode megakernel (ops/decode_megakernel.py): end-to-end
parity vs the per-layer kernel path through llama_forward (interpret mode,
small dims with the kernel's real geometry: head_dim == group == 128)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import LlamaConfig
from audio_llama_tpu.models import llama as lm
from audio_llama_tpu.models import llama_int4 as l4


def _mini_cfg():
    # hd must be 128 (kernel geometry); keep everything else tiny
    return LlamaConfig(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=256,
        num_layers=2,
        num_heads=2,
        num_kv_heads=1,
        head_dim=128,
        rms_norm_eps=1e-5,
    )


def _setup(fmt, seed=0, rotate=False):
    cfg = _mini_cfg()
    key = jax.random.PRNGKey(seed)
    params = lm.init_params(cfg, key, dtype=jnp.bfloat16)
    if rotate:
        from audio_llama_tpu.models import llama_rotate as rt

        params = rt.rotate_llama(params, cfg, jax.random.fold_in(key, 7))
    qp = l4.quantize_llama_int4(params, fuse=True, fmt=fmt, group=128)
    B, max_len = 1, 64
    cache = lm.KVCache.zeros(cfg, B, max_len, quantized=4)
    rng = np.random.RandomState(seed + 1)
    ids = jnp.asarray(rng.randint(3, cfg.vocab_size - 3, (B, 7)), jnp.int32)
    return cfg, qp, cache, ids


def _run(cfg, qp, cache, ids, mega: bool, steps=3):
    """Prefill via the XLA path, then `steps` single-token decode steps on
    the requested path; returns (logit trail, final cache arrays)."""
    from jax.experimental.pallas import tpu as pltpu

    from audio_llama_tpu.ops import int4_matmul as i4mod

    os.environ["MEGA_DECODE"] = "interp" if mega else "0"
    # the unfused arm must take the TPU production kernels in interpret
    # mode (fused MLP f32 SiLU, stacked int4 matmuls), not the CPU XLA
    # oracles — those are differently-ordered f32 programs with larger
    # ulp drift than the kernel-vs-kernel comparison this test pins
    os.environ["MLP_FUSED"] = "interp"
    orig_avail = i4mod.available
    i4mod.available = lambda: True
    try:
        with pltpu.force_tpu_interpret_mode():
            logits, cache = lm.llama_forward(
                qp, cfg, input_ids=ids, kv_cache=cache,
                compute_dtype=jnp.bfloat16, attn_impl="xla",
                assume_fresh_cache=True,
            )
        cache = lm.KVCache(
            k=cache.k, v=cache.v, length=jnp.int32(ids.shape[1]),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        trail = []
        with pltpu.force_tpu_interpret_mode():
            for _ in range(steps):
                logits, cache = lm.llama_forward(
                    qp, cfg, input_ids=tok[:, None], kv_cache=cache,
                    compute_dtype=jnp.bfloat16, attn_impl="decode_mono",
                )
                trail.append(np.asarray(logits[:, 0], np.float32))
                tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return trail, cache
    finally:
        os.environ.pop("MEGA_DECODE", None)
        os.environ.pop("MLP_FUSED", None)
        i4mod.available = orig_avail


@pytest.mark.parametrize("fmt", ["pair", "obin"])
def test_megakernel_matches_unfused(fmt):
    cfg, qp, cache0, ids = _setup(fmt)
    # fresh caches per arm (the decode steps mutate them)
    ref_trail, ref_cache = _run(cfg, qp, cache0, ids, mega=False)
    cfg, qp, cache1, ids = _setup(fmt)
    meg_trail, meg_cache = _run(cfg, qp, cache1, ids, mega=True)

    for t, (a, b) in enumerate(zip(ref_trail, meg_trail)):
        np.testing.assert_allclose(
            a, b, rtol=0.1, atol=0.15,
            err_msg=f"logits diverged at decode step {t} (fmt={fmt})",
        )
        # the argmax chain must agree exactly (token-identical decode)
        assert np.argmax(a, -1) == np.argmax(b, -1)
    # Cache contents: the fused and unfused pipelines are separately
    # compiled f32 programs, so ulp-level drift can flip borderline int4
    # roundings (the repo's OWN fused-vs-planes MLP paths differ the same
    # way — measured 131/256 hidden elements at 1 bf16 ulp). Allow ±1
    # nibble on a small fraction of fresh rows; scales must match tightly.
    kref = np.asarray(ref_cache.k).astype(np.int32)
    kmeg = np.asarray(meg_cache.k).astype(np.int32)
    lo_d = np.abs((kref & 0xF) - (kmeg & 0xF))
    hi_d = np.abs((kref >> 4) - (kmeg >> 4))
    assert lo_d.max() <= 1 and hi_d.max() <= 1, "non-rounding cache diff"
    frac = ((lo_d + hi_d) > 0).mean()
    assert frac < 0.01, f"too many cache nibble flips: {frac:.4f}"
    np.testing.assert_allclose(
        np.asarray(ref_cache.k_scale), np.asarray(meg_cache.k_scale),
        rtol=1e-2, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ref_cache.v_scale), np.asarray(meg_cache.v_scale),
        rtol=1e-2, atol=1e-6,
    )


def test_megakernel_rotated_tree():
    """QuaRot trees (the bits=4 serving default) ride the megakernel
    unchanged — the R1 sandwich lives outside the layer stack."""
    cfg, qp, cache0, ids = _setup("obin", seed=3, rotate=True)
    ref_trail, _ = _run(cfg, qp, cache0, ids, mega=False)
    cfg, qp, cache1, ids = _setup("obin", seed=3, rotate=True)
    meg_trail, _ = _run(cfg, qp, cache1, ids, mega=True)
    for a, b in zip(ref_trail, meg_trail):
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.2)
        assert np.argmax(a, -1) == np.argmax(b, -1)


def test_megakernel_gate_refuses_bad_geometry():
    from audio_llama_tpu.ops import decode_megakernel as mk

    cfg = _mini_cfg()
    qp = l4.quantize_llama_int4(
        lm.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16),
        fuse=True, fmt="pair", group=128,
    )
    slabs = {n: qp["layers"][n] for n in
             ("qkv_proj", "o_proj", "gateup_proj", "down_proj")}
    assert mk.ok_for(cfg, slabs, 64)
    assert not mk.ok_for(cfg, slabs, 63)  # timeline not 32-aligned
    bad = dict(cfg.__dict__) if hasattr(cfg, "__dict__") else None
    cfg16 = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=64,
    )
    assert not mk.ok_for(cfg16, slabs, 64)  # head_dim != 128
    del bad
