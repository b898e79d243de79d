"""Feature front-end tests vs independent numpy/FFT references
(SURVEY.md §4 test 5; no librosa in this container, so the oracle is
numpy's FFT + a hand-rolled HTK mel bank)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qasr.features import (
    FrontendConfig,
    delta,
    frame_signal,
    log_mel_spectrogram,
    mel_filterbank,
    normalize_features,
    num_frames,
    quaternion_features,
)

CFG = FrontendConfig()


def _numpy_logmel(x, cfg=CFG):
    """Independent reference: numpy rfft power spectrum -> mel -> log."""
    t = num_frames(len(x), cfg)
    window = np.hamming(cfg.win_length)
    frames = np.stack(
        [x[i * cfg.hop_length : i * cfg.hop_length + cfg.win_length] for i in range(t)]
    )
    spec = np.fft.rfft(frames * window, n=cfg.n_fft, axis=-1)
    power = np.abs(spec) ** 2
    mel = power @ mel_filterbank(cfg)
    return np.log(np.maximum(mel, cfg.log_floor))


class TestSTFT:
    def test_framing(self):
        x = jnp.arange(1000, dtype=jnp.float32)[None]
        frames = frame_signal(x, CFG)
        assert frames.shape == (1, num_frames(1000, CFG), CFG.win_length)
        np.testing.assert_array_equal(frames[0, 1, :5], np.arange(160, 165))

    def test_logmel_matches_numpy_fft(self):
        rng = np.random.RandomState(0)
        x = rng.randn(16000).astype(np.float32)  # 1 s
        got = np.asarray(log_mel_spectrogram(jnp.asarray(x)[None])[0])
        want = _numpy_logmel(x)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_pure_tone_peaks_at_right_mel(self):
        # 1 kHz tone should put its energy near the mel bin containing 1 kHz
        sr = CFG.sample_rate
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        mel = np.asarray(log_mel_spectrogram(jnp.asarray(x)[None])[0]).mean(axis=0)
        peak = mel.argmax()
        # find which filter has max response at 1 kHz
        fb = mel_filterbank(CFG)
        bin_1k = int(round(1000.0 * CFG.n_fft / sr))
        want = fb[bin_1k].argmax()
        assert abs(int(peak) - int(want)) <= 1


class TestMelBank:
    def test_shapes_and_coverage(self):
        fb = mel_filterbank(CFG)
        assert fb.shape == (257, 40)
        assert (fb >= 0).all()
        # every filter has some support
        assert (fb.sum(axis=0) > 0).all()


class TestDeltas:
    def test_delta_of_linear_ramp_is_slope(self):
        # c_t = a*t  ->  regression delta = a (away from edges)
        a = 0.7
        feat = (a * jnp.arange(50, dtype=jnp.float32))[None, :, None]
        d = delta(feat, n=2)
        np.testing.assert_allclose(np.asarray(d[0, 5:45, 0]), a, rtol=1e-5)

    def test_delta_matches_reference_formula(self):
        rng = np.random.RandomState(1)
        c = rng.randn(1, 30, 4).astype(np.float32)
        n = 2
        got = np.asarray(delta(jnp.asarray(c), n=n))
        denom = 2 * sum(k * k for k in range(1, n + 1))
        padded = np.pad(c, ((0, 0), (n, n), (0, 0)), mode="edge")
        want = np.zeros_like(c)
        for t in range(30):
            acc = np.zeros((1, 4))
            for k in range(1, n + 1):
                acc += k * (padded[:, t + n + k] - padded[:, t + n - k])
            want[:, t] = acc / denom
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestQuaternionFeatures:
    def test_shape_and_packing(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 8000).astype(np.float32))
        feat = quaternion_features(x)
        t = num_frames(8000, CFG)
        assert feat.shape == (2, t, 160)
        # first 40 channels are the raw log-mel
        fbank = log_mel_spectrogram(x)
        np.testing.assert_allclose(np.asarray(feat[..., :40]), np.asarray(fbank), rtol=1e-5)
        # second block is delta of the first
        np.testing.assert_allclose(
            np.asarray(feat[..., 40:80]), np.asarray(delta(fbank)), rtol=1e-5, atol=1e-6
        )

    def test_normalize(self):
        rng = np.random.RandomState(3)
        feat = jnp.asarray(rng.randn(2, 20, 8).astype(np.float32) * 5 + 3)
        lengths = jnp.array([20, 11])
        out = normalize_features(feat, lengths)
        v = np.asarray(out[1, :11])
        np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=1e-5)
        np.testing.assert_allclose(v.var(axis=0), 1.0, rtol=1e-3)
        assert (np.asarray(out[1, 11:]) == 0).all()
