"""Host-side numeric optimizers.

Reference analogs: utils/optimization.cpp — Brent 1-D (minimizeOneDimen
:322), Newton 1-D (minimizeNewton :422), multi-dim BFGS/L-BFGS-B
(minimizeMultiDimen / lbfgsb). Here: a self-contained Brent and thin
wrappers over scipy.optimize for the multivariate cases. These optimize
*host* scalars (model parameters); each function evaluation is a jitted
device call, so the chatty loop lives on host by design (SURVEY §7).
"""

from __future__ import annotations

import numpy as np
from scipy import optimize as sopt


def brent_minimize(f, lo: float, hi: float, guess: float | None = None,
                   xtol: float = 1e-6, max_iter: int = 100):
    """Minimize f on [lo, hi]; returns (x, f(x))."""
    res = sopt.minimize_scalar(
        f, bounds=(lo, hi), method="bounded",
        options={"xatol": xtol, "maxiter": max_iter})
    x, fx = float(res.x), float(res.fun)
    if guess is not None:
        fg = f(guess)
        if fg < fx:
            return float(guess), float(fg)
    return x, fx


def lbfgsb_minimize(f, x0: np.ndarray, lower: np.ndarray, upper: np.ndarray,
                    grad=None, eps: float = 1e-4, max_iter: int = 200):
    """Bounded multivariate minimization; numeric gradients if none given.

    Reference analog: L-BFGS-B entry (utils/optimization.h:234).
    """
    bounds = list(zip(lower, upper))
    res = sopt.minimize(
        f, np.asarray(x0, dtype=np.float64), jac=grad, bounds=bounds,
        method="L-BFGS-B",
        options={"maxiter": max_iter, "ftol": 1e-10, "eps": eps})
    return np.asarray(res.x), float(res.fun)


def bfgs_box_minimize(f, x0, lower, upper, max_iter: int = 200):
    x, fx = lbfgsb_minimize(f, x0, lower, upper, max_iter=max_iter)
    return x, fx
