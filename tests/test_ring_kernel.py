"""Kernel-tier ring causal attention (parallel/ring_kernel.py): forward +
GRADIENT parity vs single-device full causal attention and vs the XLA ring,
on virtual CPU meshes with interpret-mode Pallas hops. This is the perf
tier of decoder-training sequence parallelism (round-3 VERDICT #7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.ops.attention import (
    causal_bias, combine_bias, mha, padding_bias,
)
from audio_llama_tpu.parallel.ring_kernel import ring_kernel_sharded


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


@pytest.mark.parametrize("axes", [[("sp", 2)], [("sp", 4)],
                                  [("dp", 2), ("sp", 4)]])
def test_ring_kernel_matches_full_causal(axes):
    q, k, v, mask, bias = _setup()
    ref = mha(q, k, v, bias=bias)
    fn = ring_kernel_sharded(_mesh(axes), interpret=True)
    out = fn(q, k, v, mask)
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], atol=2e-5, rtol=2e-5
    )


def test_ring_kernel_gradients_match():
    """The flash-stats ring backward (per-hop _dq/_dkv kernels with GLOBAL
    stats, grad accumulators rotating home with their blocks) must equal
    the single-device gradients."""
    q, k, v, mask, bias = _setup(T=64, pad_from=0)
    fn = ring_kernel_sharded(_mesh([("sp", 4)]), interpret=True)

    def loss_ring(q, k, v):
        return jnp.sum(fn(q, k, v, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha(q, k, v, bias=causal_bias(64, 64)) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gn, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name}",
        )


def test_ring_kernel_gradients_with_padding():
    q, k, v, mask, bias = _setup(T=64, pad_from=48)
    fn = ring_kernel_sharded(_mesh([("sp", 4)]), interpret=True)
    mreal = np.asarray(mask, bool)

    def loss_ring(q, k, v):
        out = fn(q, k, v, mask)
        return jnp.sum(jnp.where(mask[..., None, None] > 0, out, 0.0) ** 2)

    def loss_ref(q, k, v):
        out = mha(q, k, v, bias=bias)
        return jnp.sum(jnp.where(mask[..., None, None] > 0, out, 0.0) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gn, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name}",
        )


def test_ring_kernel_matches_xla_ring():
    from audio_llama_tpu.parallel.ring_attention import (
        ring_attention_sharded,
    )

    q, k, v, mask, _ = _setup(T=128, pad_from=100)
    mesh = _mesh([("sp", 4)])
    a = ring_attention_sharded(mesh)(q, k, v, mask)
    b = ring_kernel_sharded(mesh, interpret=True)(q, k, v, mask)
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(b)[m], np.asarray(a)[m], atol=2e-5, rtol=2e-5
    )


def test_sp_train_step_uses_kernel_ring():
    """End-to-end: the sp-sharded train step with interpret kernels (which
    now routes ring attention through the kernel tier) still matches the
    XLA ring path — pinned by comparing against use_kernel=False via the
    partitioning wrapper."""
    from audio_llama_tpu.ops import partitioning as ptn

    q, k, v, mask, _ = _setup(T=64, pad_from=0)
    mesh = _mesh([("sp", 4)])
    with ptn.kernel_partitioning(mesh):
        out_k = ptn.wrap_ring_causal(
            q, k, v, mask, q.shape[-1] ** -0.5, interpret=True
        )
        out_x = ptn.wrap_ring_causal(
            q, k, v, mask, q.shape[-1] ** -0.5, use_kernel=False
        )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), atol=2e-5, rtol=2e-5
    )
