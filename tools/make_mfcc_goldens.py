"""Freeze MFCC goldens from a torch-reconstructed torchaudio pipeline.

torchaudio is not installed here, but its default MFCC pipeline is fully
documented and reconstructible from installed-torch primitives
(VERDICT r2 item 6; same offline-goldens recipe as
tools/make_reference_goldens.py):

  torchaudio.transforms.MFCC(log_mels=True, n_mfcc=20,
      melkwargs=dict(n_fft=200, hop_length=100, n_mels=128))
  (= the exact call at
   /root/reference/benchmark_classification/datasets/speech_commands.py:54-55)

expands to, with all defaults as of torchaudio's documentation:
  * Spectrogram: torch.stft(n_fft=200, hop_length=100, win_length=200,
    window=torch.hann_window(200)  [PERIODIC],
    center=True, pad_mode="reflect", normalized=False, onesided=True),
    power=2.0
  * MelScale: melscale_fbanks(n_freqs=101, f_min=0, f_max=sr/2,
    n_mels=128, sample_rate=16000, norm=None, mel_scale="htk"):
    htk mel = 2595*log10(1+f/700), unnormalized triangles on
    all_freqs = linspace(0, sr/2, n_freqs)
  * log_mels=True: log(mel + 1e-6)  (natural log, log_offset 1e-6)
  * create_dct(n_mfcc=20, n_mels=128, norm="ortho"): DCT-II,
    row 0 scaled by 1/sqrt(2), all rows by sqrt(2/n_mels); applied as
    logmel @ dct

Writes tests/goldens/mfcc.npz with deterministic waveforms + goldens.
"""

import os

import numpy as np
import torch

SR = 16000
N_FFT = 200
HOP = 100
N_MELS = 128
N_MFCC = 20


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sr):
    """torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk'):
    triangles via the documented slope construction."""
    all_freqs = torch.linspace(0, sr // 2, n_freqs, dtype=torch.float64)
    m_min = float(hz_to_mel_htk(f_min))
    m_max = float(hz_to_mel_htk(f_max))
    m_pts = torch.linspace(m_min, m_max, n_mels + 2, dtype=torch.float64)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]                     # [n_mels+1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)  # [n_freqs, n_mels+2]
    down_slopes = (-slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down_slopes, up_slopes), min=0.0)
    return fb                                            # [n_freqs, n_mels]


def create_dct(n_mfcc, n_mels):
    """torchaudio.functional.create_dct(norm='ortho') -> [n_mels, n_mfcc],
    applied as logmel @ dct."""
    n = torch.arange(n_mels, dtype=torch.float64)
    k = torch.arange(n_mfcc, dtype=torch.float64)[None, :]
    dct = torch.cos(np.pi / n_mels * (n[:, None] + 0.5) * k)
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    dct *= np.sqrt(2.0 / n_mels)
    return dct


def torch_mfcc(audio: torch.Tensor) -> torch.Tensor:
    """audio [T] -> [frames, n_mfcc] through the reconstructed pipeline."""
    audio = audio.to(torch.float64)
    window = torch.hann_window(N_FFT, periodic=True, dtype=torch.float64)
    spec = torch.stft(audio, n_fft=N_FFT, hop_length=HOP, win_length=N_FFT,
                      window=window, center=True, pad_mode="reflect",
                      normalized=False, onesided=True,
                      return_complex=True)
    power = spec.abs() ** 2                              # [n_freqs, frames]
    fb = melscale_fbanks(N_FFT // 2 + 1, 0.0, SR / 2, N_MELS, SR)
    mel = power.T @ fb                                   # [frames, n_mels]
    logmel = torch.log(mel + 1e-6)
    dct = create_dct(N_MFCC, N_MELS)
    return (logmel @ dct).to(torch.float32)              # [frames, n_mfcc]


def main():
    rng = np.random.default_rng(20260817)
    t = np.arange(SR) / SR
    waves = {
        # voiced-ish harmonic stack with noise
        "harmonic": (0.4 * np.sin(2 * np.pi * 220 * t)
                     + 0.2 * np.sin(2 * np.pi * 440 * t + 0.5)
                     + 0.1 * np.sin(2 * np.pi * 880 * t + 1.1)
                     + 0.02 * rng.normal(size=SR)),
        # white noise
        "noise": 0.3 * rng.normal(size=SR),
        # chirp 100->4000 Hz
        "chirp": 0.5 * np.sin(2 * np.pi * (100 * t + 0.5 * (4000 - 100)
                                           * t ** 2)),
        # silence with a click (tests log floor)
        "click": np.zeros(SR),
    }
    waves["click"][8000] = 0.9
    out = {}
    for name, w in waves.items():
        w32 = w.astype(np.float32)
        out[f"wave_{name}"] = w32
        out[f"mfcc_{name}"] = torch_mfcc(torch.from_numpy(w32)).numpy()
    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "goldens", "mfcc.npz")
    np.savez_compressed(os.path.abspath(path), **out)
    print(f"wrote {os.path.abspath(path)}:",
          {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
