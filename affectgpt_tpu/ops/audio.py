"""Device-side audio front-end: sinc resampling + kaldi-compatible fbank.

Replaces torchaudio's C++/ffmpeg path (reference:
my_affectgpt/models/ImageBind/data.py:28-67 `waveform2melspec`,
:117-166 `load_and_transform_audio_data`, :170-239 load/transform split)
with jit-compiled XLA ops so the whole waveform→mel pipeline runs on
device: framing is a strided gather, the window/preemphasis are fused
elementwise ops, the FFT is XLA's rfft, and the mel projection is a
single MXU matmul.

Numerical contract (matches kaldi/torchaudio semantics used by the
reference): 25 ms hann frames at 10 ms shift, snip-edges, per-frame DC
removal, preemphasis 0.97 with clamped first sample, FFT padded to the
next power of two, 128 mel bins on the kaldi HTK mel scale with
low_freq=20 Hz, log with float32-epsilon floor, output padded/cut to
204 frames and normalized with mean -4.268 / std 9.138.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu import constants

_EPSILON = 1.1920928955078125e-07  # float32 machine epsilon, kaldi log floor


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


@lru_cache(maxsize=8)
def mel_filterbank(
    num_bins: int = constants.AUDIO_NUM_MEL_BINS,
    fft_size: int = 512,
    sample_rate: int = constants.AUDIO_SAMPLE_RATE,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style triangular mel filterbank over FFT bins.

    Returns [num_bins, fft_size//2 + 1] float32; the nyquist column is
    zero (kaldi computes weights for fft_size//2 bins and zero-pads).
    """
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    num_fft_bins = fft_size // 2
    fft_bin_width = sample_rate / fft_size

    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_freqs = mel_scale(fft_bin_width * np.arange(num_fft_bins))  # [F]
    left = mel_low + np.arange(num_bins)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta

    up = (bin_freqs[None, :] - left) / (center - left)
    down = (right - bin_freqs[None, :]) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
    return np.pad(weights, ((0, 0), (0, 1)))  # zero nyquist column


def _hann_window(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))).astype(np.float32)


@partial(jax.jit, static_argnames=("sample_rate", "num_mel_bins", "target_length"))
def fbank(
    waveform: jnp.ndarray,
    sample_rate: int = constants.AUDIO_SAMPLE_RATE,
    num_mel_bins: int = constants.AUDIO_NUM_MEL_BINS,
    target_length: int = constants.AUDIO_TARGET_FRAMES,
) -> jnp.ndarray:
    """[num_samples] waveform → [num_mel_bins, target_length] log-mel.

    Equivalent of reference `waveform2melspec` (ImageBind/data.py:28-67),
    including the leading whole-clip mean subtraction.
    """
    waveform = waveform.astype(jnp.float32)
    waveform = waveform - jnp.mean(waveform)

    frame_length = int(sample_rate * 0.025)
    frame_shift = int(sample_rate * 0.010)
    num_samples = waveform.shape[0]
    num_frames = 1 + (num_samples - frame_length) // frame_shift
    fft_size = 2 ** math.ceil(math.log2(frame_length))

    # Strided framing as a single gather: [num_frames, frame_length].
    idx = (
        np.arange(num_frames, dtype=np.int32)[:, None] * frame_shift
        + np.arange(frame_length, dtype=np.int32)[None, :]
    )
    frames = waveform[idx]

    # Per-frame DC removal, then preemphasis with clamped first sample.
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - 0.97 * prev

    frames = frames * jnp.asarray(_hann_window(frame_length))

    spectrum = jnp.abs(jnp.fft.rfft(frames, n=fft_size, axis=1)) ** 2  # [T, F+1]
    mel = spectrum @ jnp.asarray(mel_filterbank(num_mel_bins, fft_size, sample_rate)).T
    mel = jnp.log(jnp.maximum(mel, _EPSILON))  # [T, num_mel_bins]

    mel = mel.T  # [num_mel_bins, T]
    if num_frames >= target_length:
        mel = mel[:, :target_length]
    else:
        mel = jnp.pad(mel, ((0, 0), (0, target_length - num_frames)))
    return mel


@jax.jit
def transform_audio(clips: jnp.ndarray) -> jnp.ndarray:
    """[n_clips, 1, clip_samples] raw clips → [n_clips, 1, 128, 204]
    normalized log-mels (reference `transform_audio`, data.py:218-239)."""
    mels = jax.vmap(fbank)(clips[:, 0, :])
    mels = (mels - constants.AUDIO_MEL_MEAN) / constants.AUDIO_MEL_STD
    return mels[:, None, :, :]


@lru_cache(maxsize=32)
def _sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Tuple[np.ndarray, int, int, int]:
    """Windowed-sinc polyphase kernel with torchaudio's sinc_interp_hann
    semantics (the resampler the reference relies on at data.py:136-139).

    Returns (kernels [new_g, 1, kernel_width], width, orig_g, new_g).
    """
    gcd = math.gcd(orig_freq, new_freq)
    orig_g, new_g = orig_freq // gcd, new_freq // gcd

    base_freq = min(orig_g, new_g) * rolloff
    width = math.ceil(lowpass_filter_width * orig_g / base_freq)

    idx = np.arange(-width, width + orig_g, dtype=np.float64)[None, :] / orig_g
    t = np.arange(0, -new_g, -1, dtype=np.float64)[:, None] / new_g + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t = t * np.pi
    scale = base_freq / orig_g
    kernels = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernels = (kernels * window * scale).astype(np.float32)
    return kernels[:, None, :], width, orig_g, new_g


def resample(waveform: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample [..., time] waveform via polyphase sinc convolution.

    The polyphase filter bank is applied as one strided conv (MXU work)
    rather than the reference's host-side torchaudio call.
    """
    if orig_freq == new_freq:
        return waveform
    kernels, width, orig_g, new_g = _sinc_resample_kernel(orig_freq, new_freq)
    length = waveform.shape[-1]
    target_length = int(math.ceil(new_g * length / orig_g))

    lead_shape = waveform.shape[:-1]
    x = waveform.reshape((-1, 1, length)).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig_g)))
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernels),
        window_strides=(orig_g,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [batch, new_g, ceil-ish frames]
    y = jnp.transpose(y, (0, 2, 1)).reshape((x.shape[0], -1))[:, :target_length]
    return y.reshape((*lead_shape, target_length))


def resample_numpy(waveform: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Host (numpy) polyphase resample with the *same* kernel as the device
    path — used by CPU dataloader workers so host- and device-resampled
    audio are bit-identical up to float order."""
    if orig_freq == new_freq:
        return waveform.astype(np.float32)
    kernels, width, orig_g, new_g = _sinc_resample_kernel(orig_freq, new_freq)
    kernels = kernels[:, 0, :]  # [new_g, kw]
    lead = waveform.shape[:-1]
    length = waveform.shape[-1]
    target_length = int(math.ceil(new_g * length / orig_g))
    x = waveform.reshape(-1, length).astype(np.float32)
    x = np.pad(x, ((0, 0), (width, width + orig_g)))
    kw = kernels.shape[1]
    num_windows = (x.shape[1] - kw) // orig_g + 1
    # strided windows [batch, num_windows, kw]
    windows = np.lib.stride_tricks.sliding_window_view(x, kw, axis=1)[:, ::orig_g]
    y = np.einsum("bwk,pk->bwp", windows[:, :num_windows], kernels)  # [b, w, new_g]
    y = y.reshape(x.shape[0], -1)[:, :target_length]
    return y.reshape(*lead, target_length)


def extract_clips(
    waveform: jnp.ndarray,
    sample_rate: int = constants.AUDIO_SAMPLE_RATE,
    clip_duration: float = constants.AUDIO_CLIP_SECONDS,
    clips_per_video: int = constants.AUDIO_CLIPS_PER_VIDEO,
) -> jnp.ndarray:
    """[time] mono waveform (>= clip_duration·sr samples) → [clips, 1, clip_samples].

    Uniform clip placement matching ConstantClipsPerVideoSampler
    (reference: data.py:70-77). Starts are computed from the static
    length, so the gather indices are compile-time constants.
    """
    clip_samples = int(clip_duration * sample_rate)
    length = waveform.shape[0]
    duration = length / sample_rate
    max_start = max(duration - clip_duration, 0.0)
    starts = np.linspace(0.0, max_start, clips_per_video)
    start_samples = np.minimum(
        (starts * sample_rate).astype(np.int64), max(length - clip_samples, 0)
    )
    idx = start_samples[:, None] + np.arange(clip_samples)[None, :]
    return waveform[idx][:, None, :]


def load_audio_clips(waveform: np.ndarray, orig_freq: int) -> jnp.ndarray:
    """Full reference `load_audio` pipeline for one file (data.py:170-215):
    resample→mono→zero-pad-to-2s→8 uniform 2s clips. Returns [8, 1, 32000]."""
    wav = jnp.asarray(waveform, dtype=jnp.float32)
    if wav.ndim == 1:
        wav = wav[None, :]
    wav = resample(wav, orig_freq, constants.AUDIO_SAMPLE_RATE)
    if wav.shape[0] == 2:
        wav = jnp.mean(wav, axis=0, keepdims=True)
    wav = wav[0]
    min_len = int(constants.AUDIO_CLIP_SECONDS * constants.AUDIO_SAMPLE_RATE)
    if wav.shape[0] < min_len:
        wav = jnp.pad(wav, (0, min_len - wav.shape[0]))
    return extract_clips(wav)
