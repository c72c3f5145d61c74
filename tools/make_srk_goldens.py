"""Generate SRK (SRIW1/SRID2) pathwise parity goldens (run offline, once).

torchsde's method='srk' for diagonal Ito SDEs is the Rößler (2010) SRID2
scheme — the default solver for the entire torch-ists stream family
(/root/reference/torch-ists/torch_ists/diff_module/NSDE/nsde_model.py:63-69).
torchsde itself is not installed here, so this transcribes the same tableau
(Rößler 2010, Thm 6.2; torchsde _core/methods/tableaus/sri2.py constants)
into an *independent* float64 torch loop and records trajectory + parameter
gradients on injected (dW, I10). tests/test_reference_parity.py then asserts
snsde's `method='srk'` reproduces both pathwise — convergence-order tests
cannot distinguish two different valid order-1.5 schemes; shared-noise
pathwise agreement can.

Output (committed): tests/goldens/reference_srk.npz
"""

import pathlib
import sys

import numpy as np
import torch

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "tests" / "goldens" / "reference_srk.npz"

# SRID2 tableau (Rößler 2010; torchsde sri2.py)
C0 = (0.0, 3 / 4, 0.0, 0.0)
C1 = (0.0, 1 / 4, 1.0, 1 / 4)
A0 = ((), (3 / 4,), (0.0, 0.0), (0.0, 0.0, 0.0))
A1 = ((), (1 / 4,), (1.0, 0.0), (0.0, 0.0, 1 / 4))
B0 = ((), (3 / 2,), (0.0, 0.0), (0.0, 0.0, 0.0))
B1 = ((), (1 / 2,), (-1.0, 0.0), (-5.0, 3.0, 1 / 2))
ALPHA = (1 / 3, 2 / 3, 0.0, 0.0)
BETA1 = (-1.0, 4 / 3, 2 / 3, 0.0)
BETA2 = (-1.0, 4 / 3, -1 / 3, 0.0)
BETA3 = (2.0, -4 / 3, -2 / 3, 0.0)
BETA4 = (-2.0, 5 / 3, -2 / 3, 1.0)
STAGES = 4


def srid2_step(f, g, t0, dt, y, I1, I10):
    rdt = 1.0 / dt
    sqrt_dt = dt ** 0.5
    I11 = 0.5 * (I1 * I1 - dt)
    I111 = (I1 ** 3 - 3.0 * dt * I1) / 6.0
    H0, H1, fH, gH = [], [], [], []
    for s in range(STAGES):
        h0 = y
        h1 = y
        for j in range(s):
            if A0[s][j]:
                h0 = h0 + A0[s][j] * fH[j] * dt
            if B0[s][j]:
                h0 = h0 + B0[s][j] * gH[j] * (I10 * rdt)
            if A1[s][j]:
                h1 = h1 + A1[s][j] * fH[j] * dt
            if B1[s][j]:
                h1 = h1 + B1[s][j] * gH[j] * sqrt_dt
        H0.append(h0)
        H1.append(h1)
        fH.append(f(t0 + C0[s] * dt, h0))
        gH.append(g(t0 + C1[s] * dt, h1))
    y1 = y
    for s in range(STAGES):
        if ALPHA[s]:
            y1 = y1 + ALPHA[s] * fH[s] * dt
        coeff = (BETA1[s] * I1 + BETA2[s] * I11 / sqrt_dt
                 + BETA3[s] * I10 * rdt + BETA4[s] * I111 * rdt)
        y1 = y1 + coeff * gH[s]
    return y1


def main():
    rng = np.random.default_rng(0)
    B, D, M = 4, 3, 16
    dt = 0.05
    grid = np.arange(M + 1, dtype=np.float64) * dt
    y0 = rng.normal(size=(B, D))
    dW = rng.normal(size=(M, B, D)) * np.sqrt(dt)
    Z = rng.normal(size=(M, B, D))
    # space-time Lévy area I_(1,0) over [t, t+dt]:
    # I10 = dt/2 * (dW + Z * sqrt(dt/3)),  Z ⟂ dW  (torchsde BrownianInterval)
    I10 = 0.5 * dt * (dW + Z * np.sqrt(dt / 3.0))

    # nonlinear, time- and state-dependent diagonal SDE with 4 scalar params
    params0 = np.array([-0.5, 0.3, 0.25, 0.1])
    a = torch.tensor(params0[0], dtype=torch.float64, requires_grad=True)
    b = torch.tensor(params0[1], dtype=torch.float64, requires_grad=True)
    c = torch.tensor(params0[2], dtype=torch.float64, requires_grad=True)
    d = torch.tensor(params0[3], dtype=torch.float64, requires_grad=True)

    def f(t, y):
        return a * y + b * torch.sin(torch.as_tensor(t, dtype=y.dtype) + y)

    def g(t, y):
        return c * y + d * torch.cos(y)

    y = torch.tensor(y0, dtype=torch.float64)
    ys = [y]
    for k in range(M):
        y = srid2_step(
            f, g, float(grid[k]), dt, y,
            torch.tensor(dW[k]), torch.tensor(I10[k]),
        )
        ys.append(y)
    traj = torch.stack(ys)                       # [M+1, B, D]
    loss = (traj[-1] ** 2).sum()
    loss.backward()
    grads = np.array([p.grad.item() for p in (a, b, c, d)])

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        OUT,
        grid=grid, y0=y0, dW=dW, I10=I10, params=params0,
        traj=traj.detach().numpy(), loss=float(loss.detach()),
        grads=grads,
    )
    print(f"wrote {OUT}: traj {traj.shape}, loss {float(loss):.6f}, "
          f"grads {grads}")


if __name__ == "__main__":
    sys.exit(main())
