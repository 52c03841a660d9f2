"""Audio frontend: waveform -> log-mel spectrogram, matching HF
ClapFeatureExtractor's unfused ("rand_trunc") path to numeric tolerance.

The reference calls this through transformers' feature extractor
(reference models/audio_encoder.py:133-176). Here it's a jit-compiled JAX
function: frame -> Hann window -> rFFT power -> slaney mel filterbank ->
power-to-dB, all on device. The mel filterbank and the framing matrix are
static numpy constants baked at trace time.

Spec (verified against transformers 4.57 ClapFeatureExtractor): 48 kHz,
n_fft 1024, hop 480, 64 slaney-scale/slaney-norm mels over 0..14 kHz,
periodic Hann, center=True reflect padding, power 2.0, dB floor 1e-10.
10 s -> 1001 frames. Shorter audio is repeat-padded ("repeatpad"), longer is
cropped (host-side, see ``prepare_waveform``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from clap2diffusion_tpu.core.config import AudioFrontendConfig


def hertz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    mels = 3.0 * freq / 200.0
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    log_region = freq >= min_log_hertz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hertz) / min_log_hertz) * logstep,
        mels,
    )
    return mels


def mel_to_hertz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    freq = 200.0 * mels / 3.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freq = np.where(
        log_region, 1000.0 * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)), freq
    )
    return freq


def mel_filter_bank_slaney(
    num_frequency_bins: int,
    num_mel_filters: int,
    min_frequency: float,
    max_frequency: float,
    sampling_rate: int,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filters [freq_bins, mels]."""
    mel_min = hertz_to_mel_slaney(min_frequency)
    mel_max = hertz_to_mel_slaney(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = mel_to_hertz_slaney(mel_freqs)

    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)
    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]  # [bins, mels+2]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _windowed_dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT as two matmul constants with the Hann window folded in.

    ``jnp.fft.rfft`` lowers to an XLA FFT custom call that the TPU backend
    runs far from speed-of-light; the same transform as two [n_fft, bins]
    matmuls rides the MXU (2.1 GFLOP for the 10 s clip — microseconds).
    The periodic Hann window (np.hanning(M+1)[:-1], what HF's
    window_function builds) is a diagonal scale folded into the constants.
    """
    n = np.arange(n_fft, dtype=np.float64)
    window = 0.5 - 0.5 * np.cos(2 * np.pi * n / n_fft)
    bins = n_fft // 2 + 1
    ang = 2.0 * np.pi * np.outer(n, np.arange(bins, dtype=np.float64)) / n_fft
    cos_w = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_w = (np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_w, sin_w


@functools.partial(jax.jit, static_argnums=(1,))
def _log_mel_impl(waveform: jax.Array, cfg: AudioFrontendConfig) -> jax.Array:
    n_fft, hop = cfg.n_fft, cfg.hop_length

    x = waveform.astype(jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    num_frames = 1 + (x.shape[-1] - n_fft) // hop

    # Framing + windowed rFFT as ONE dense [F, S*hop] x [S*hop, 2*bins]
    # matmul. Each output frame spans S = ceil(n_fft/hop) consecutive
    # hop-sized blocks, so S shifted reshape views of the waveform
    # concatenated along the last axis give the frame matrix with pure
    # layout ops (no gather). History: an advanced-index gather cost
    # 7.3 ms on v5e; the strided-conv formulation that replaced it still
    # lowered to a VPU loop at ~0.65 TF/s (3.2 ms/encode, device trace
    # round 3); this dense matmul rides the MXU at the cost of
    # (S*hop - n_fft) zero rows folded into the constant.
    cos_w, sin_w = _windowed_dft_matrices(n_fft)
    bins = n_fft // 2 + 1
    lead = x.shape[:-1]
    s_blocks = -(-n_fft // hop)
    need = (num_frames + s_blocks - 1) * hop
    if need > x.shape[-1]:
        # tail zero-pad: the extra samples only meet zero filter rows
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - x.shape[-1])])
    frames = jnp.concatenate(
        [
            x[..., k * hop : (k + num_frames) * hop].reshape(
                lead + (num_frames, hop)
            )
            for k in range(s_blocks)
        ],
        axis=-1,
    )  # [..., F, S*hop]
    filt = np.concatenate([cos_w, sin_w], axis=1)
    filt = np.concatenate(
        [filt, np.zeros((s_blocks * hop - n_fft, 2 * bins), np.float32)], axis=0
    )
    spec = jnp.dot(frames, jnp.asarray(filt), precision="highest",
                   preferred_element_type=jnp.float32)
    re, im = spec[..., :bins], spec[..., bins:]
    power = re * re + im * im

    fb = jnp.asarray(
        mel_filter_bank_slaney(
            n_fft // 2 + 1, cfg.num_mel_bins, cfg.f_min, cfg.f_max, cfg.sample_rate
        )
    )
    mel = jnp.dot(power, fb, precision="highest",
                  preferred_element_type=jnp.float32)
    return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


def log_mel_spectrogram(waveform: jax.Array, cfg: AudioFrontendConfig | None = None) -> jax.Array:
    """[..., samples] -> [..., frames, mels] log-mel in dB."""
    return _log_mel_impl(waveform, cfg or AudioFrontendConfig())


def fit_to_length(x: np.ndarray, target: int) -> np.ndarray:
    """Repeatpad shorter audio / crop longer audio to ``target`` samples
    (dtype-preserving; the unfused feature extractor's "repeatpad" rule)."""
    if len(x) < target:
        if len(x) > 0:
            n_repeat = target // len(x)
            x = np.tile(x, max(n_repeat, 1))
        x = np.pad(x, (0, target - len(x)))
    elif len(x) > target:
        x = x[:target]
    return x


def prepare_waveform(
    waveform: np.ndarray, sample_rate: int, cfg: AudioFrontendConfig | None = None
) -> np.ndarray:
    """Host-side: mono-ize, resample to 48 kHz, repeatpad/crop to 10 s.

    Mirrors the unfused feature-extractor path (repeatpad + leading crop) and
    the reference's preprocessing (reference models/audio_encoder.py:87-131;
    it center/leading-crops rather than random-crops at inference).
    """
    cfg = cfg or AudioFrontendConfig()
    x = np.asarray(waveform, dtype=np.float32)
    if x.ndim == 2:  # [channels, samples] -> mono
        x = x.mean(axis=0)
    if sample_rate != cfg.sample_rate:
        from clap2diffusion_tpu.utils.audio_io import resample_poly

        x = resample_poly(x, sample_rate, cfg.sample_rate)
    return fit_to_length(x, cfg.num_samples)
