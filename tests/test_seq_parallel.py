"""Encoder-window sequence parallelism (parallel/seq_parallel.py — step 1 of
docs/LONG_CONTEXT.md): sharding the N-window axis of long audio over an
'sp' mesh axis must be numerically invisible vs the single-device chunked
encode, including with a 'dp' batch axis alongside and with the interpret-
mode Pallas kernel paths engaged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.models import allm
from audio_llama_tpu.parallel.seq_parallel import make_sp_encode


def _mesh(axes):
    n = int(np.prod([s for _, s in axes]))
    devs = np.array(jax.devices()[:n]).reshape([s for _, s in axes])
    return jax.sharding.Mesh(devs, tuple(a for a, _ in axes))


def _setup(B=2, n_windows=4, seed=0):
    cfg = AudioLLMConfig.tiny()
    frozen = allm.init_frozen(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    S = cfg.mel.max_samples
    rng = np.random.RandomState(seed)
    audio = jnp.asarray(rng.randn(B, n_windows * S).astype(np.float32) * 0.1)
    return cfg, frozen, audio


@pytest.mark.parametrize("axes", [[("sp", 4)], [("dp", 2), ("sp", 4)]])
def test_sp_encode_matches_chunked(axes):
    cfg, frozen, audio = _setup()
    ref = allm.process_audio_features(frozen, cfg, audio, jnp.float32)

    mesh = _mesh(axes)
    fn = make_sp_encode(cfg, mesh, compute_dtype=jnp.float32)
    got = fn(frozen, audio)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_sp_encode_kernel_paths():
    """Same parity with the real Pallas kernel code paths (interpret mode)
    running inside the shard_map shards."""
    cfg, frozen, audio = _setup()
    ref = allm.process_audio_features(frozen, cfg, audio, jnp.float32)
    mesh = _mesh([("sp", 4)])
    fn = make_sp_encode(
        cfg, mesh, compute_dtype=jnp.float32,
        enc_attn_impl="enc_kernel_interpret", mel_impl="pallas_interpret",
    )
    got = fn(frozen, audio)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_sp_encode_validates():
    cfg, frozen, audio = _setup(n_windows=3)
    mesh = _mesh([("sp", 4)])
    fn = make_sp_encode(cfg, mesh)
    with pytest.raises(ValueError, match="must divide"):
        fn(frozen, audio)
    with pytest.raises(ValueError, match="no 'sp' axis"):
        make_sp_encode(cfg, _mesh([("dp", 4)]))
