"""Speech Commands v0.02 pipeline: 10 keywords, 16 kHz -> MFCC(20).

Rebuilds /root/reference/benchmark_classification/datasets/
speech_commands.py:13-104: the ten target words, 1-second clips at 16 kHz,
log-mel MFCC with 20 coefficients, n_fft=200, hop=100 -> [N, 161, 20].

The MFCC is implemented here in numpy/scipy (no torchaudio): frame ->
Hann-windowed FFT power -> mel filterbank -> log -> DCT-II, matching the
torchaudio MelSpectrogram/MFCC defaults the reference relies on.
Download-gated with a synthetic fallback.
"""

from __future__ import annotations

import os
import tarfile
import wave
from typing import Optional

import numpy as np

from .common import cache_path, load_cached, save_cached

URL = "http://download.tensorflow.org/data/speech_commands_v0.02.tar.gz"
WORDS = ["yes", "no", "up", "down", "left", "right", "on", "off", "stop",
         "go"]
SAMPLE_RATE = 16000
N_MFCC = 20
N_FFT = 200
HOP = 100
N_MELS = 128


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(n_mels=N_MELS, n_fft=N_FFT, sr=SAMPLE_RATE):
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_freqs, n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def _dct_matrix(n_out, n_in):
    # orthonormal DCT-II
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.cos(np.pi / n_in * (n + 0.5) * k)
    mat[0] *= 1.0 / np.sqrt(2.0)
    return (mat * np.sqrt(2.0 / n_in)).astype(np.float32)


def mfcc(audio: np.ndarray, n_mfcc=N_MFCC, n_fft=N_FFT, hop=HOP):
    """audio [T] float32 -> [frames, n_mfcc] (torchaudio-style center
    padding, Hann window, log-mel, DCT)."""
    pad = n_fft // 2
    x = np.pad(audio.astype(np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    # PERIODIC Hann (torch.hann_window default; np.hanning is the
    # symmetric variant — off by one bin, caught by the torch-frozen
    # goldens in tests/goldens/mfcc.npz)
    window = (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft)
                                  / n_fft))).astype(np.float32)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * window
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1)) ** 2
    fb = mel_filterbank(n_fft=n_fft)
    mel = spec @ fb
    logmel = np.log(mel + 1e-6)
    dct = _dct_matrix(n_mfcc, fb.shape[1])
    return (logmel @ dct.T).astype(np.float32)


def _read_wav(data: bytes) -> np.ndarray:
    import io

    with wave.open(io.BytesIO(data)) as w:
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    if len(x) < SAMPLE_RATE:
        x = np.pad(x, (0, SAMPLE_RATE - len(x)))
    return x[:SAMPLE_RATE]


def load_from_archive(data_dir: str):
    tpath = os.path.join(data_dir, os.path.basename(URL))
    if not os.path.exists(tpath):
        raise FileNotFoundError(
            f"{tpath} missing — download speech_commands_v0.02.tar.gz into "
            f"{data_dir} (no network egress in this environment)"
        )
    Xs, ys = [], []
    with tarfile.open(tpath, "r:gz") as tf:
        for member in tf.getmembers():
            parts = member.name.split("/")
            if len(parts) < 2 or parts[-2] not in WORDS:
                continue
            if not member.name.endswith(".wav"):
                continue
            audio = _read_wav(tf.extractfile(member).read())
            Xs.append(mfcc(audio))
            ys.append(WORDS.index(parts[-2]))
    X = np.stack(Xs)                       # [N, 161, 20]
    y = np.asarray(ys, np.int64)
    lengths = np.full((X.shape[0],), X.shape[1], np.int64)
    times = np.arange(X.shape[1], dtype=np.float32)
    return X, y, lengths, times


def get_data(data_dir: Optional[str] = None, n_synthetic: int = 2048,
             synthetic_fallback: bool = True, seed: int = 0):
    data_dir = data_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "snsde", "speech"
    )
    cp = cache_path("speech_mfcc", dir=data_dir)
    cached = load_cached(cp)
    if cached is not None:
        return cached
    try:
        out = load_from_archive(data_dir)
        save_cached(cp, out)
        return out
    except FileNotFoundError:
        if not synthetic_fallback:
            raise
        from .synthetic import synthetic_speech

        return synthetic_speech(n=n_synthetic, seed=seed)
