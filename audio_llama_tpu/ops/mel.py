"""Log-mel spectrogram frontend (XLA implementation).

Replaces the reference's TWO inconsistent featurizers (SURVEY.md §2):
  - training: torchaudio MelSpectrogram(n_fft=400, hop=160, n_mels=128,
    power=2) + log(x+1e-9)  (reference src/dataset.py:125-133; htk mels,
    no norm) — reproduced here as style='ref';
  - inference: HF WhisperFeatureExtractor (reference src/inference.py:101-105;
    slaney mels, log10 + dynamic-range clamp + affine) — reproduced here as
    style='whisper' and used as OUR canonical frontend (it is what the frozen
    Whisper encoder was trained on, so it is the WER-relevant choice).

Design (TPU-first): the mel filterbank and DFT basis are host-side numpy
constants; framing is a gather; window/DFT/mel are matmuls and elementwise ops
— everything jit-compiles into one fused XLA program that runs on-device, so
featurization moves OFF the host dataloader (where the reference does it) and
onto the TPU next to the encoder. A Pallas-fused version lives in
ops/mel_pallas.py; this module is its reference and the CPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MelConfig


# ---------------------------------------------------------------------------
# Host-side constant tables
# ---------------------------------------------------------------------------

def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    """Hann window; periodic matches torch.hann_window / whisper."""
    m = n if periodic else n - 1
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / m))).astype(np.float32)


def _hz_to_mel(f, htk: bool):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        return np.where(
            f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel
        )


def _mel_to_hz(m, htk: bool):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2+1] (librosa-compatible).

    style='whisper' uses (htk=False, norm='slaney', fmax=8000) — identical to
    the matrix baked into WhisperFeatureExtractor. style='ref' uses
    (htk=True, norm=None, fmax=sr/2) — torchaudio MelSpectrogram defaults.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb = fb * enorm[:, None]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _tables(cfg: MelConfig):
    window = hann_window(cfg.n_fft, periodic=True)
    if cfg.style == "whisper":
        fb = mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.num_mel_bins, fmax=8000.0,
            htk=False, norm="slaney",
        )
    elif cfg.style == "ref":
        fb = mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.num_mel_bins, fmax=None,
            htk=True, norm=None,
        )
    else:
        raise ValueError(f"unknown mel style {cfg.style!r}")
    return window, fb


# ---------------------------------------------------------------------------
# jit-able featurizer
# ---------------------------------------------------------------------------

def _frame(audio: jnp.ndarray, n_fft: int, hop: int, num_frames: int) -> jnp.ndarray:
    """audio [..., S+n_fft (already center-padded)] -> frames [..., num_frames, n_fft]."""
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]  # [F, n_fft] host constant
    return jnp.take(audio, jnp.asarray(idx), axis=-1)


def log_mel(audio: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """waveform [..., max_samples] f32 @ 16 kHz -> log-mel [..., n_mels, num_frames].

    Static shapes: input must already be padded/trimmed to cfg.max_samples
    (30 s -> 480000) — the data layer guarantees this. Output is
    [..., n_mels, 3000], matching what the Whisper encoder expects.
    """
    window, fb = _tables(cfg)
    n_fft, hop = cfg.n_fft, cfg.hop_length
    num_frames = cfg.num_frames  # whisper drops the trailing frame => exactly S/hop

    audio = audio.astype(jnp.float32)
    # center=True reflect padding (whisper & torchaudio both do this)
    pad = n_fft // 2
    audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")

    frames = _frame(audio, n_fft, hop, num_frames)  # [..., F, n_fft]
    frames = frames * jnp.asarray(window)
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)  # [..., F, n_bins]

    mel = power @ jnp.asarray(fb).T  # [..., F, n_mels]
    mel = jnp.swapaxes(mel, -1, -2)  # [..., n_mels, F]

    if cfg.style == "whisper":
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        # dynamic-range clamp: per-item max over (mels, frames)
        max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, max_val - 8.0)
        return (log_spec + 4.0) / 4.0
    else:  # 'ref': log(mel + 1e-9), reference src/dataset.py:133
        return jnp.log(mel + 1e-9)


def log_mel_batch(audio: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """[B, S] -> [B, n_mels, F] (alias; log_mel already handles batch dims)."""
    return log_mel(audio, cfg)
