"""Ornstein–Uhlenbeck synthetic dataset (tutorial data generator,
reference tutorial notebooks cell 3: dX = θ(μ−X)dt + σ dW, Euler, 1000
samples × 20 steps, T=10, channels = [t, X])."""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["generate_ou_paths", "ou_dataset"]


def generate_ou_paths(key, num_samples: int, T: float = 10.0, N: int = 20,
                      theta: float = 0.2, mu: float = 0.0,
                      sigma: float = 0.1, x0: float = 1.0):
    """Vectorized Euler simulation of OU paths.

    Returns data [num_samples, N, 2] with channels (time, value) — the
    tutorial's layout — and normalized times [N] (linspace 0..1)."""
    dt = T / N
    t_phys = jnp.linspace(0.0, T, N)
    eps = jax.random.normal(key, (num_samples, N - 1)) * jnp.sqrt(dt)

    def step(x, e):
        x_next = x + theta * (mu - x) * dt + sigma * e
        return x_next, x_next

    x_init = jnp.full((num_samples,), x0)
    _, xs = jax.lax.scan(step, x_init, eps.T)
    X = jnp.concatenate([x_init[None], xs], axis=0).T        # [B, N]
    tgrid = jnp.broadcast_to(t_phys, (num_samples, N))
    data = jnp.stack([tgrid, X], axis=-1)                     # [B, N, 2]
    times = jnp.linspace(0.0, 1.0, N)
    return data, times


def ou_dataset(key, num_samples: int = 1000, T: float = 10.0, N: int = 20,
               theta: float = 0.2, mu: float = 0.0, sigma: float = 0.1,
               x0: float = 1.0, train_ratio: float = 0.8):
    """Full tutorial pipeline: paths -> hermite coeffs -> train/test split.
    Returns dict with train/test (data, coeffs) + times."""
    from ..ops.interp import hermite_cubic_coeffs

    kd, ks = jax.random.split(key)
    data, times = generate_ou_paths(kd, num_samples, T, N, theta, mu, sigma,
                                    x0)
    coeffs = hermite_cubic_coeffs(times, data)
    n_train = int(num_samples * train_ratio)
    perm = jax.random.permutation(ks, num_samples)
    tr, te = perm[:n_train], perm[n_train:]
    return {
        "train_data": np.asarray(data[tr]),
        "train_coeffs": np.asarray(coeffs[tr]),
        "test_data": np.asarray(data[te]),
        "test_coeffs": np.asarray(coeffs[te]),
        "times": np.asarray(times),
    }
