"""Round-trip tests: Python FLAC encoder fixtures -> native C++ decoder,
plus WAV IO and resampling."""

import os

import numpy as np
import pytest

from audio_llama_tpu.data import audio_io, flac_write


def _sine(n=16000, sr=16000, freq=440.0, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int64)


@pytest.fixture(scope="module")
def lib():
    audio_io.build_native()
    return True


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"])
def test_flac_roundtrip_mono_modes(tmp_path, lib, mode):
    x = _sine(12345)
    p = str(tmp_path / f"m_{mode}.flac")
    flac_write.write_flac(p, x, 16000, bps=16, mode=mode)
    audio, sr = audio_io.read_flac(p)
    assert sr == 16000
    assert audio.shape == (12345, 1)
    np.testing.assert_array_equal(
        (audio[:, 0] * 32768.0).round().astype(np.int64), x
    )


def test_flac_roundtrip_constant(tmp_path, lib):
    x = np.full(5000, 123, np.int64)
    p = str(tmp_path / "const.flac")
    flac_write.write_flac(p, x, 16000, mode="constant")
    audio, sr = audio_io.read_flac(p)
    np.testing.assert_array_equal((audio[:, 0] * 32768.0).round().astype(np.int64), x)


@pytest.mark.parametrize("stereo_mode", ["independent", "left_side", "right_side", "mid_side"])
def test_flac_roundtrip_stereo(tmp_path, lib, stereo_mode):
    left = _sine(9000, freq=440)
    right = _sine(9000, freq=523)
    x = np.stack([left, right], axis=1)
    p = str(tmp_path / f"s_{stereo_mode}.flac")
    flac_write.write_flac(p, x, 16000, mode="fixed2", stereo_mode=stereo_mode)
    audio, sr = audio_io.read_flac(p)
    assert audio.shape == (9000, 2)
    np.testing.assert_array_equal(
        (audio * 32768.0).round().astype(np.int64), x
    )


def test_flac_random_noise_roundtrip(tmp_path, lib):
    """Noise stresses rice coding with large residuals."""
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32767, 44100).astype(np.int64)
    p = str(tmp_path / "noise.flac")
    flac_write.write_flac(p, x, 22050, mode="verbatim")
    audio, sr = audio_io.read_flac(p)
    assert sr == 22050
    np.testing.assert_array_equal((audio[:, 0] * 32768.0).round().astype(np.int64), x)


def test_flac_probe(tmp_path, lib):
    x = _sine(3000)
    p = str(tmp_path / "probe.flac")
    flac_write.write_flac(p, x, 16000)
    with open(p, "rb") as f:
        import ctypes

        data = f.read()
    lib_ = audio_io._get_lib()
    info = audio_io._FlacInfo()
    assert lib_.flac_probe(data, len(data), audio_io.ctypes.byref(info)) == 0
    assert info.sample_rate == 16000
    assert info.channels == 1
    assert info.bits_per_sample == 16
    assert info.total_samples == 3000


def test_flac_float_waveform_roundtrip(tmp_path, lib):
    """Float [-1,1] input must be scaled to full-scale PCM, not truncated to
    silence (regression: a bare astype(int) wrote zeros for |x| < 1)."""
    rng = np.random.default_rng(2)
    w = (rng.standard_normal(12345) * 0.1).astype(np.float32)
    p = str(tmp_path / "f.flac")
    flac_write.write_flac(p, w, 16000)
    audio, sr = audio_io.read_flac(p)
    np.testing.assert_allclose(audio[:, 0], np.clip(w, -1, 1), atol=5e-5)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.uniform(-0.9, 0.9, 8000)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio_io.write_wav(p, x, 16000)
    audio, sr = audio_io.read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(audio[:, 0], x, atol=1e-4)


def test_load_audio_resamples(tmp_path):
    x = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000).astype(np.float32) * 0.5
    p = str(tmp_path / "r.wav")
    audio_io.write_wav(p, x, 8000)
    out = audio_io.load_audio(p, target_sr=16000)
    assert out.ndim == 1
    assert abs(len(out) - 16000) < 10


def test_load_audio_mono_mixdown(tmp_path, lib):
    left = _sine(4000, freq=440)
    right = _sine(4000, freq=523)
    p = str(tmp_path / "mix.flac")
    flac_write.write_flac(p, np.stack([left, right], 1), 16000)
    out = audio_io.load_audio(p, target_sr=16000, mono=True)
    expected = (left + right).astype(np.float64) / 2.0 / 32768.0
    np.testing.assert_allclose(out, expected, atol=1e-4)


@pytest.mark.parametrize(
    "corruption",
    ["truncated_half", "truncated_header", "empty", "garbage", "bad_magic", "bitflips"],
)
def test_flac_decoder_rejects_corrupt_input(tmp_path, lib, corruption):
    """The native decoder must raise (never crash) on malformed files — a
    segfault in the ctypes decoder would take down a whole training run."""
    valid = str(tmp_path / "v.flac")
    flac_write.write_flac(
        valid, (np.random.default_rng(0).standard_normal(8000) * 0.1).astype(np.float32),
        16000,
    )
    data = open(valid, "rb").read()
    payloads = {
        "truncated_half": data[: len(data) // 2],
        "truncated_header": data[:20],
        "empty": b"",
        "garbage": bytes(np.random.default_rng(1).integers(0, 256, 4096, dtype=np.uint8)),
        "bad_magic": b"XLaC" + data[4:],
        "bitflips": bytes(b ^ (0xFF if i % 997 == 0 else 0) for i, b in enumerate(data)),
    }
    p = str(tmp_path / f"{corruption}.flac")
    open(p, "wb").write(payloads[corruption])
    with pytest.raises(Exception):
        audio_io.read_flac(p)
