"""Pallas TPU kernels: the fused solver hot path.

fused_em    — Euler–Maruyama, the reference benchmarks' default solver
              (full input_option x noise_option grid, custom-VJP
              backward, optional in-kernel Brownian RNG)
fused_srk   — SRIW1 stochastic Runge–Kutta, the torch-ists default
multi       — lane-packed multi-model solves (K models per invocation)
"""

from .fused_em import fused_em_solve, supports_fused
from .fused_srk import fused_srk_solve, supports_fused_srk
from .multi import fused_em_solve_packed, fused_srk_solve_packed, pack_fields

__all__ = [
    "fused_em_solve",
    "fused_srk_solve",
    "fused_em_solve_packed",
    "fused_srk_solve_packed",
    "pack_fields",
    "supports_fused",
    "supports_fused_srk",
]
