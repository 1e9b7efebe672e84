"""Audio front-end tests: fbank vs an independent numpy golden, resampler
spectral fidelity, clip extraction geometry."""

import math

import numpy as np
import pytest

from affectgpt_tpu import constants
from affectgpt_tpu.ops import audio as audio_ops


def golden_fbank_numpy(waveform: np.ndarray, sample_rate=16000, num_mel_bins=128,
                       target_length=204) -> np.ndarray:
    """Slow, loop-based kaldi fbank written independently from the spec
    (25ms hann / 10ms shift / snip edges / DC removal / preemph 0.97 /
    pow2 FFT / HTK mel, low=20Hz / log eps floor)."""
    waveform = waveform.astype(np.float64)
    waveform = waveform - waveform.mean()
    frame_length, frame_shift = 400, 160
    fft_size = 512
    num_frames = 1 + (len(waveform) - frame_length) // frame_shift
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame_length) / (frame_length - 1))

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    # triangular filters
    low, high = 20.0, sample_rate / 2.0
    mel_lo, mel_hi = mel(low), mel(high)
    delta = (mel_hi - mel_lo) / (num_mel_bins + 1)
    bin_mels = mel(np.arange(fft_size // 2) * sample_rate / fft_size)

    # filter weights built with explicit per-bin loops (independent of ops/audio.py)
    weights = np.zeros((num_mel_bins, fft_size // 2))
    for m in range(num_mel_bins):
        left = mel_lo + m * delta
        center = left + delta
        right = center + delta
        for j in range(fft_size // 2):
            bm = bin_mels[j]
            if left < bm <= center:
                weights[m, j] = (bm - left) / (center - left)
            elif center < bm < right:
                weights[m, j] = (right - bm) / (right - center)

    feats = np.zeros((num_frames, num_mel_bins))
    for t in range(num_frames):
        fr = waveform[t * frame_shift : t * frame_shift + frame_length].copy()
        fr -= fr.mean()
        pre = np.empty_like(fr)
        pre[0] = fr[0] - 0.97 * fr[0]
        pre[1:] = fr[1:] - 0.97 * fr[:-1]
        fr = pre * window
        spec = np.abs(np.fft.rfft(fr, n=fft_size)) ** 2
        feats[t] = np.maximum(weights @ spec[: fft_size // 2], 1.1920928955078125e-07)
    feats = np.log(feats).T  # [mel, T]
    if feats.shape[1] >= target_length:
        return feats[:, :target_length]
    return np.pad(feats, ((0, 0), (0, target_length - feats.shape[1])))


class TestFbank:
    def test_matches_golden(self):
        rng = np.random.RandomState(0)
        wav = rng.randn(32000).astype(np.float32) * 0.1
        ours = np.asarray(audio_ops.fbank(wav))
        gold = golden_fbank_numpy(wav)
        assert ours.shape == (128, 204)
        # 198 real frames from 2s audio; remaining 6 are zero padding
        np.testing.assert_allclose(ours[:, :198], gold[:, :198], rtol=1e-3, atol=1e-3)
        assert np.all(ours[:, 198:] == 0)

    def test_transform_audio_normalization(self):
        rng = np.random.RandomState(1)
        clips = rng.randn(8, 1, 32000).astype(np.float32) * 0.05
        out = np.asarray(audio_ops.transform_audio(clips))
        assert out.shape == (8, 1, 128, 204)
        raw = np.asarray(audio_ops.fbank(clips[3, 0]))
        np.testing.assert_allclose(
            out[3, 0], (raw - constants.AUDIO_MEL_MEAN) / constants.AUDIO_MEL_STD,
            rtol=1e-5, atol=1e-5,
        )


class TestResample:
    @pytest.mark.parametrize("orig", [44100, 48000, 22050, 8000])
    def test_tone_preserved(self, orig):
        t = np.arange(int(orig * 1.0)) / orig
        tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        out = np.asarray(audio_ops.resample(tone, orig, 16000))
        assert out.shape[0] == math.ceil(16000 * len(tone) / orig)
        # compare against an ideal 440 Hz tone at 16 kHz (skip filter edges)
        t16 = np.arange(len(out)) / 16000
        ideal = np.sin(2 * np.pi * 440.0 * t16)
        core = slice(200, len(out) - 200)
        err = np.sqrt(np.mean((out[core] - ideal[core]) ** 2))
        assert err < 0.01, f"RMS error {err} at orig={orig}"

    def test_identity(self):
        x = np.random.RandomState(2).randn(1000).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(audio_ops.resample(x, 16000, 16000)), x)


class TestClips:
    def test_extract_clips_geometry(self):
        sr = 16000
        wav = np.arange(sr * 5, dtype=np.float32)  # 5 s ramp
        clips = np.asarray(audio_ops.extract_clips(wav))
        assert clips.shape == (8, 1, 32000)
        # first clip starts at 0, last clip ends at the waveform end
        assert clips[0, 0, 0] == 0
        assert clips[-1, 0, -1] == sr * 5 - 1
        # starts uniformly spaced
        starts = clips[:, 0, 0]
        np.testing.assert_allclose(np.diff(starts), np.diff(starts)[0], atol=1.5)

    def test_load_audio_clips_short_audio_padded(self):
        wav = np.ones(8000, dtype=np.float32)  # 0.5 s
        clips = np.asarray(audio_ops.load_audio_clips(wav, 16000))
        assert clips.shape == (8, 1, 32000)
        assert np.all(clips[:, :, 8000:] == 0)  # zero-padded tail

    def test_load_audio_clips_stereo_mixdown_and_resample(self):
        rng = np.random.RandomState(3)
        wav = rng.randn(2, 44100).astype(np.float32)
        clips = np.asarray(audio_ops.load_audio_clips(wav, 44100))
        assert clips.shape == (8, 1, 32000)
