"""Pallas TPU kernels: the fused solver hot path.

fused_em    — Euler–Maruyama, the reference benchmarks' default solver
              (full input_option x noise_option grid, custom-VJP
              backward, optional in-kernel Brownian RNG)
fused_srk   — SRIW1 stochastic Runge–Kutta, the torch-ists default
fused_cde   — explicit-RK CDE solves dz = f(z) dX (the NCDE family's
              rk4 default), matrix-field contraction as one-hot MXU ops
fused_rnn   — GRU recurrences on-chip (discrete baselines, BiGRU
              decoders; hoisted input projection)
multi       — lane-packed multi-model solves (K models per invocation)
"""

from .fused_cde import fused_cde_solve, supports_fused_cde
from .fused_em import fused_em_solve, supports_fused
from .fused_rnn import fused_gru_scan, supports_fused_gru
from .fused_srk import fused_srk_solve, supports_fused_srk
from .multi import fused_em_solve_packed, fused_srk_solve_packed, pack_fields

__all__ = [
    "fused_cde_solve",
    "fused_em_solve",
    "fused_srk_solve",
    "fused_em_solve_packed",
    "fused_srk_solve_packed",
    "pack_fields",
    "fused_gru_scan",
    "supports_fused",
    "supports_fused_gru",
    "supports_fused_cde",
    "supports_fused_srk",
]
