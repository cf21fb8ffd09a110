"""Audio frontend: WAV IO, resampling, mel / MFCC features, onset strength.

Capability of the reference's ``data_utils/utils.py:14-244`` (librosa load,
torchaudio MFCC n_mfcc=64, mel, onset detection for the beat-consistency
metric) implemented from first principles on numpy/scipy — the runtime image
carries no librosa/torchaudio. Feature definitions follow the standard
HTK/librosa formulations so numbers are comparable.

All functions are host-side preprocessing (one-time, cached); the hot path
consumes precomputed feature arrays.
"""

from __future__ import annotations

import wave
from typing import Optional

import numpy as np
from scipy.signal import resample_poly
from scipy.fftpack import dct


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------

def load_wav(path: str, target_sr: int = 16000, mono: bool = True) -> np.ndarray:
    """Read a PCM WAV, downmix to mono, resample to target_sr. -> float32 [-1, 1]."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch)
        x = x.mean(axis=1) if mono else x.T
    if sr != target_sr:
        g = np.gcd(sr, target_sr)
        x = resample_poly(x, target_sr // g, sr // g, axis=-1)
    return np.ascontiguousarray(x, np.float32)


# ---------------------------------------------------------------------------
# spectrogram / mel / mfcc
# ---------------------------------------------------------------------------

def _frame(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Centered framing with reflect padding (librosa stft convention)."""
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[idx]


def stft_mag(x: np.ndarray, n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    """(T, n_fft//2+1) magnitude spectrogram, Hann window."""
    frames = _frame(x, n_fft, hop) * np.hanning(n_fft)[None, :]
    return np.abs(np.fft.rfft(frames, axis=-1)).astype(np.float32)


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: Optional[float] = None) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular filters, Slaney-style area norm."""
    fmax = fmax or sr / 2
    pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)), np.float32)
    for i in range(n_mels):
        lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (bins - lo) / max(c - lo, 1e-8)
        down = (hi - bins) / max(hi - c, 1e-8)
        fb[i] = np.clip(np.minimum(up, down), 0, None)
        fb[i] *= 2.0 / (hi - lo)  # slaney normalization
    return fb


def log_mel(x: np.ndarray, sr: int = 16000, n_fft: int = 2048, hop: int = 512,
            n_mels: int = 128) -> np.ndarray:
    """(T, n_mels) log-power mel spectrogram."""
    mag = stft_mag(x, n_fft, hop)
    power = mag ** 2
    mel = power @ mel_filterbank(sr, n_fft, n_mels).T
    return np.log(np.maximum(mel, 1e-10)).astype(np.float32)


def mfcc(x: np.ndarray, sr: int = 16000, n_mfcc: int = 64, n_fft: int = 2048,
         hop: Optional[int] = None, fps: Optional[float] = None,
         n_mels: int = 128) -> np.ndarray:
    """(T, n_mfcc) MFCCs (DCT-II ortho of the log-mel, torchaudio semantics).

    The reference derives hop from the motion fps (hop 535 at 16 kHz / 30fps,
    data_utils/utils.py:188); pass fps to reproduce that.
    """
    if hop is None:
        hop = int(round(sr / fps)) if fps else 512
    lm = log_mel(x, sr, n_fft, hop, n_mels)
    return dct(lm, type=2, axis=-1, norm="ortho")[:, :n_mfcc].astype(np.float32)


def audio_chunking(x: np.ndarray, frame_rate: int = 30,
                   chunk_size: int = 16000) -> np.ndarray:
    """(S,) waveform -> (T, chunk_size) overlapping chunks centered per
    motion frame (the meshtalk-style frontend, data_utils/utils.py
    audio_chunking)."""
    hop = 16000 // frame_rate
    n = len(x) // hop
    half = chunk_size // 2
    xp = np.pad(x, (half, half))
    out = np.empty((n, chunk_size), np.float32)
    for i in range(n):
        c = i * hop + half
        out[i] = xp[c - half: c + half]
    return out


def mfcc_sepa(x: np.ndarray, sr: int = 16000, n_mfcc: int = 64,
              fps: float = 30.0, split_sec: float = 2.0):
    """MFCCs computed in two halves around a split point and concatenated —
    the reference's ``get_mfcc_sepa`` (data_utils/utils.py:219-244) used for
    continuation inference. Returns (features (T, n_mfcc), split_frame)."""
    split = int(split_sec * sr)
    a = mfcc(x[:split], sr, n_mfcc, fps=fps)
    b = mfcc(x[split:], sr, n_mfcc, fps=fps)
    return np.concatenate([a, b], axis=0), a.shape[0]


def mel_chunked(x: np.ndarray, sr: int = 16000, n_mels: int = 64,
                fps: float = 30.0, chunk_sec: float = 5.0) -> np.ndarray:
    """Chunked mel ('mel_mul' feat method, data_utils/utils.py): long audio
    processed in chunks to bound memory, concatenated at motion fps."""
    hop = int(round(sr / fps))
    chunk = int(chunk_sec * sr)
    parts = [log_mel(x[i:i + chunk], sr, hop=hop, n_mels=n_mels)
             for i in range(0, max(len(x), 1), chunk)]
    return np.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# onsets (for the beat-consistency metric)
# ---------------------------------------------------------------------------

def onset_strength(x: np.ndarray, sr: int = 16000, n_fft: int = 2048,
                   hop: int = 512, n_mels: int = 128) -> np.ndarray:
    """Spectral-flux onset envelope (librosa onset_strength formulation:
    positive first difference of the log-mel, mean over bands)."""
    lm = log_mel(x, sr, n_fft, hop, n_mels)
    flux = np.maximum(0.0, np.diff(lm, axis=0))
    env = flux.mean(axis=-1)
    return np.concatenate([[0.0], env]).astype(np.float32)


def onset_times(x: np.ndarray, sr: int = 16000, hop: int = 512,
                pre_max: int = 3, post_max: int = 3, delta: float = 0.07,
                wait: int = 3) -> np.ndarray:
    """Peak-pick the onset envelope -> onset times in seconds
    (librosa onset_detect-style peak picking)."""
    env = onset_strength(x, sr=sr, hop=hop)
    if env.max() > 0:
        env = env / env.max()
    peaks = []
    last = -wait - 1
    for i in range(len(env)):
        lo = max(0, i - pre_max)
        hi = min(len(env), i + post_max + 1)
        if env[i] == env[lo:hi].max() and env[i] > delta + env[lo:hi].mean() \
                and i - last > wait:
            peaks.append(i)
            last = i
    return np.asarray(peaks, np.float64) * hop / sr


def interp_features_to_fps(feat: np.ndarray, n_out: int) -> np.ndarray:
    """Linearly resample (T, C) features to n_out frames (the 50->30 fps
    alignment of nets/spg/wav2vec.py:101 and F.interpolate calls)."""
    t = feat.shape[0]
    if t == n_out:
        return feat
    src = np.linspace(0.0, 1.0, t)
    dst = np.linspace(0.0, 1.0, n_out)
    out = np.empty((n_out, feat.shape[1]), np.float32)
    for c in range(feat.shape[1]):
        out[:, c] = np.interp(dst, src, feat[:, c])
    return out
