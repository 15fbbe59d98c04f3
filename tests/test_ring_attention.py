"""Ring causal attention over the 'sp' axis (parallel/ring_attention.py):
numerics + GRADIENT parity vs single-device full causal attention on the
virtual CPU mesh — the decoder-training sequence-parallel primitive
(docs/LONG_CONTEXT.md step 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.ops.attention import causal_bias, combine_bias, mha, padding_bias
from audio_llama_tpu.parallel.ring_attention import ring_attention_sharded


def _mesh(axes):
    n = int(np.prod([s for _, s in axes]))
    devs = np.array(jax.devices()[:n]).reshape([s for _, s in axes])
    return jax.sharding.Mesh(devs, tuple(a for a, _ in axes))


def _setup(B=2, T=64, H=4, Hkv=2, hd=16, pad_from=56, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (B, T, H, hd), jnp.float32) * 0.5
    k = jax.random.normal(k2, (B, T, Hkv, hd), jnp.float32) * 0.5
    v = jax.random.normal(k3, (B, T, Hkv, hd), jnp.float32) * 0.5
    mask = np.ones((B, T), np.int32)
    if pad_from:
        mask[0, pad_from:] = 0
    mask = jnp.asarray(mask)
    bias = combine_bias(causal_bias(T, T), padding_bias(mask))
    return q, k, v, mask, bias


@pytest.mark.parametrize("axes", [[("sp", 4)], [("dp", 2), ("sp", 4)]])
def test_ring_matches_full_causal(axes):
    q, k, v, mask, bias = _setup()
    ref = mha(q, k, v, bias=bias)
    fn = ring_attention_sharded(_mesh(axes))
    out = fn(q, k, v, mask)
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], atol=2e-5, rtol=2e-5
    )


def test_ring_gradients_match():
    """AD through ppermute + the hop scan: dQ/dK/dV must equal the
    single-device gradients (the LoRA training path needs exactly this)."""
    q, k, v, mask, bias = _setup(T=32, pad_from=0)
    fn = ring_attention_sharded(_mesh([("sp", 4)]))

    def loss_ring(q, k, v):
        return jnp.sum(fn(q, k, v, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha(q, k, v, bias=causal_bias(32, 32)) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gn, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-5, err_msg=name
        )


def test_ring_outlier_magnitudes():
    """The per-hop true-max merge must stay exact at outlier magnitudes
    (the same regime that broke the bounded-shift kernels)."""
    q, k, v, mask, bias = _setup(T=64, pad_from=0, seed=3)
    q = q * 8.0
    k = k.at[:, 0].mul(500.0)
    ref = mha(q, k, v, bias=causal_bias(64, 64))
    fn = ring_attention_sharded(_mesh([("sp", 4)]))
    out = fn(q, k, v, jnp.ones_like(mask))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


# ---------------------------------------------------------------------------
# Sequence-parallel TRAIN STEP: the ring engages automatically inside the
# GSPMD-sharded step when the mesh has an 'sp' axis (batch token dims are
# T-sharded by parallel/sharding.py:batch_specs; causal_mha dispatches to
# wrap_ring_causal via ops/partitioning.py).
# ---------------------------------------------------------------------------

import optax

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm
from audio_llama_tpu.parallel import (
    MeshConfig, init_sharded_state, make_mesh, make_sharded_train_step,
)
from audio_llama_tpu.parallel import sharding as shd
from audio_llama_tpu.training import train_step as base_steps


def _sp_setup(batch=4, T=16, with_audio=True):
    cfg = AudioLLMConfig.tiny()
    kf, kt = jax.random.split(jax.random.PRNGKey(0))
    frozen = allm.init_frozen(cfg, kf, dtype=jnp.float32)
    trainable = allm.init_trainable(cfg, kt)
    rng = np.random.RandomState(0)
    S = cfg.mel.max_samples
    batch_t = allm.AudioLLMBatch(
        input_ids=jnp.asarray(rng.randint(3, 250, (batch, T)), jnp.int32),
        attention_mask=jnp.ones((batch, T), jnp.int32),
        audio_features=(
            jnp.asarray(rng.randn(batch, S), jnp.float32) * 0.1
            if with_audio else None
        ),
        labels=jnp.asarray(rng.randint(3, 250, (batch, T)), jnp.int32),
    )
    return cfg, frozen, trainable, batch_t


@pytest.mark.parametrize("with_audio", [False, True])
def test_sp_train_step_matches_single_device(with_audio):
    cfg, frozen, trainable, batch = _sp_setup(with_audio=with_audio)
    opt = optax.adamw(1e-3)
    sid, eid = 260, 261

    ref_step = jax.jit(base_steps.make_train_step(
        cfg, opt, sid, eid, compute_dtype=jnp.float32,
        attn_impl="causal_kernel_interpret",
    ))
    ref_state = base_steps.init_train_state(trainable, opt)
    ref_state, ref_metrics = ref_step(ref_state, frozen, batch)

    mesh = make_mesh(MeshConfig(dp=2, sp=4))
    frozen_sh = shd.shard_frozen(mesh, frozen)
    state = init_sharded_state(mesh, trainable, opt)
    # attn_impl='causal_kernel' routes through causal_mha, whose entry
    # dispatches to the (pure-XLA) ring before any Pallas lowering — safe
    # on the CPU mesh without interpret mode.
    step = make_sharded_train_step(
        cfg, opt, mesh, batch, sid, eid, compute_dtype=jnp.float32,
        donate_state=False, attn_impl="causal_kernel",
    )
    state, metrics = step(state, frozen_sh, batch)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(ref_state.trainable)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(state.trainable)),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=2e-4, err_msg=str(pa)
        )
