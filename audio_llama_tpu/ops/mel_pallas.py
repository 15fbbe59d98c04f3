"""Fused Pallas log-mel kernel (the BASELINE.json north-star kernel).

Replaces the hot path of ops/mel.py (which replaces the reference's host-side
torchaudio MelSpectrogram, reference src/dataset.py:125-133) with ONE TPU
kernel per audio tile that never materializes the framed signal in HBM:

  audio [B, S] --(XLA reflect-pad + slab layout)--> slabs [B*T, slab]
    -> kernel, grid (B*T,):
         With hop=160 and n_fft=400 (= 2.5*hop), frame f is chunks f, f+1
         and the first 80 samples of chunk f+2 of the 160-sample chunking —
         so the windowed DFT is THREE MXU matmuls against precomputed
         (hann * cos/sin) basis slices; no gather, no [F, n_fft] frame tensor:
           real = A0 @ C0 + A1 @ C1 + A2 @ C2      [Ft, n_bins]
           imag = A0 @ S0 + A1 @ S1 + A2 @ S2
           power = real^2 + imag^2                  (VPU)
           mel   = power @ fb^T                     [Ft, n_mels] (MXU)
    -> XLA epilogue (fused elementwise): style-exact log + whisper
       dynamic-range clamp (the clamp needs a global max over the clip, so it
       stays outside the tiled kernel).

Numerics are exactly ops/mel.log_mel's (same window/filterbank tables, f32
accumulation). Falls back to ops/mel.log_mel for configs the kernel doesn't
cover (hop must divide n_fft's span into whole chunk slices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MelConfig
from . import mel as mel_ref

# Frames per kernel invocation. 3000 % 250 == 0; slab = 252 chunks * 160
# samples = 157 KB f32 — comfortably VMEM-resident with the basis tables.
_FRAME_TILE = 250
_NB_PAD = 256  # n_fft//2+1 = 201 bins padded to the lane width multiple


def _supports(cfg: MelConfig) -> bool:
    return (
        cfg.n_fft == 400
        and cfg.hop_length == 160
        and cfg.num_frames % _FRAME_TILE == 0
        and cfg.num_mel_bins <= 256
        and cfg.style in ("whisper", "ref")
    )


@functools.lru_cache(maxsize=4)
def _basis(cfg: MelConfig):
    """(C [3, hop, NB], S [3, hop, NB], fbT [NB, n_mels]): windowed DFT basis
    chunk-slices and transposed mel filterbank, zero-padded to NB lanes."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    n_bins = n_fft // 2 + 1
    window, fb = mel_ref._tables(cfg)  # hann [n_fft], fb [n_mels, n_bins]

    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    cos = (np.cos(ang) * window[:, None]).astype(np.float32)  # [n_fft, n_bins]
    sin = (np.sin(ang) * window[:, None]).astype(np.float32)

    n_slices = -(-n_fft // hop)  # 3 for whisper params
    C = np.zeros((n_slices, hop, _NB_PAD), np.float32)
    S = np.zeros((n_slices, hop, _NB_PAD), np.float32)
    for s in range(n_slices):
        lo, hi = s * hop, min((s + 1) * hop, n_fft)
        C[s, : hi - lo, :n_bins] = cos[lo:hi]
        S[s, : hi - lo, :n_bins] = sin[lo:hi]

    fbT = np.zeros((_NB_PAD, fb.shape[0]), np.float32)
    fbT[:n_bins] = fb.T  # zero rows beyond n_bins keep the matmul exact
    # NB: return HOST arrays. jnp.asarray inside a jit trace yields tracers;
    # caching those here would leak them into every later trace.
    return C, S, fbT


def _kernel(slab_ref, c_ref, s_ref, fb_ref, out_ref):
    """One slab: audio chunks [1, Ft+2, hop] -> mel power [1, Ft, n_mels]."""
    ft = out_ref.shape[1]
    a = slab_ref[0]  # [Ft+2, hop]
    a0, a1, a2 = a[0:ft], a[1 : ft + 1], a[2 : ft + 2]

    def dft(basis_ref):
        acc = jnp.dot(a0, basis_ref[0], preferred_element_type=jnp.float32)
        acc += jnp.dot(a1, basis_ref[1], preferred_element_type=jnp.float32)
        acc += jnp.dot(a2, basis_ref[2], preferred_element_type=jnp.float32)
        return acc

    real = dft(c_ref)
    imag = dft(s_ref)
    power = real * real + imag * imag  # [Ft, NB]
    out_ref[0] = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)


def mel_power(audio: jnp.ndarray, cfg: MelConfig, interpret: bool = False) -> jnp.ndarray:
    """waveform [B, max_samples] -> mel power spectrogram [B, F, n_mels]."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    Ft = _FRAME_TILE
    B = audio.shape[0]
    n_tiles = cfg.num_frames // Ft
    tile_len = Ft * hop

    pad = n_fft // 2
    padded = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    need = n_tiles * tile_len + 2 * hop
    if padded.shape[1] < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
    # Overlapping slabs: tile t needs samples [t*tile_len, (t+1)*tile_len + 2*hop).
    base = padded[:, : n_tiles * tile_len].reshape(B, n_tiles, tile_len)
    look = jnp.stack(
        [
            padded[:, (t + 1) * tile_len : (t + 1) * tile_len + 2 * hop]
            for t in range(n_tiles)
        ],
        axis=1,
    )
    slabs = jnp.concatenate([base, look], axis=-1).reshape(
        B * n_tiles, Ft + 2, hop
    )

    C, S, fbT = (jnp.asarray(t) for t in _basis(cfg))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B * n_tiles, Ft, fbT.shape[1]), jnp.float32),
        grid=(B * n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, Ft + 2, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Ft, fbT.shape[1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Ft * hop * _NB_PAD * 6 + 2 * Ft * _NB_PAD * fbT.shape[1],
            bytes_accessed=(Ft + 2) * hop * 4 + Ft * fbT.shape[1] * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(slabs, C, S, fbT)
    return out.reshape(B, cfg.num_frames, -1)[..., : cfg.num_mel_bins]


def log_mel(audio: jnp.ndarray, cfg: MelConfig, interpret: bool = False) -> jnp.ndarray:
    """waveform [..., max_samples] -> log-mel [..., n_mels, F].

    Drop-in for ops/mel.log_mel (same contract/numerics), Pallas-fused.
    """
    if not _supports(cfg):
        return mel_ref.log_mel(audio, cfg)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    lead = audio.shape[:-1]
    audio2d = audio.reshape(-1, audio.shape[-1])

    from . import partitioning as ptn

    ctx = ptn.current()
    if ctx is not None:
        # GSPMD-sharded program: run the kernel per batch shard (mel is
        # embarrassingly batch-parallel; see ops/partitioning.py)
        mel = ptn.wrap_batch(
            lambda a: mel_power(a, cfg, interpret), audio2d, out_ndim=3
        )  # [B, F, n_mels]
    else:
        mel = mel_power(audio2d, cfg, interpret)  # [B, F, n_mels]
    mel = jnp.swapaxes(mel, -1, -2)  # [B, n_mels, F]

    if cfg.style == "whisper":
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, max_val - 8.0)
        out = (log_spec + 4.0) / 4.0
    else:  # 'ref': reference src/dataset.py:133
        out = jnp.log(mel + 1e-9)
    out = out.reshape(*lead, *out.shape[-2:])
    return out[0] if squeeze else out


def uses_pallas(cfg: MelConfig) -> bool:
    return _supports(cfg)


def should_use(cfg: MelConfig) -> bool:
    """Auto-dispatch policy: the compiled kernel on TPU-like backends; the XLA
    featurizer elsewhere (interpret-mode Pallas on CPU is debug-only slow)."""
    try:
        backend = jax.default_backend()
        on_tpu = backend in ("tpu", "axon") or any(
            d.platform == "tpu" for d in jax.devices()
        )
    except Exception:
        return False
    return _supports(cfg) and on_tpu
