"""Explicit Runge-Kutta Butcher tableaus.

Solver-name parity with the reference's torchdiffeq surface
(FI-ODE pl_modules.py:18-21):
  adaptive: dopri5, dopri8, bosh3, fehlberg2, adaptive_heun
  fixed:    euler, midpoint, rk4, explicit_adams, implicit_adams, fixed_adams

``dopri8`` is realised as DOP853 (the 8(5,3) Dormand-Prince method) using the
coefficient tables shipped with scipy (`scipy.integrate._ivp.dop853_coefficients`)
— same family/order as torchdiffeq's dopri8, slightly different embedded error
estimate (the standard 5th/3rd-order DOP853 combination).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

__all__ = ["Tableau", "get_tableau", "ADAPTIVE_SOLVERS", "FIXED_SOLVERS"]

ADAPTIVE_SOLVERS = ("dopri5", "dopri8", "bosh3", "fehlberg2", "adaptive_heun")
FIXED_SOLVERS = (
    "euler",
    "midpoint",
    "rk4",
    "explicit_adams",
    "implicit_adams",
    "fixed_adams",
)


@dataclasses.dataclass(frozen=True)
class Tableau:
    """Explicit RK tableau.  err_weights = b - b_hat (None -> no embedded est).

    ``order`` is the order used in the step-size controller exponent
    (torchdiffeq passes the *higher* order of the pair).
    ``fsal``: first-same-as-last (stage-s slope equals f(t1, y1)).
    ``dop853_err``: use the DOP853 combined 5th/3rd error estimate, with
    err5/err3 rows stored in ``err5`` / ``err3``.
    """

    name: str
    order: int
    c: np.ndarray
    a: np.ndarray  # (s, s) strictly lower triangular
    b: np.ndarray  # (s,) solution weights
    err: Optional[np.ndarray]  # (s,) b - b_hat
    fsal: bool = False
    dop853_err: bool = False
    err5: Optional[np.ndarray] = None
    err3: Optional[np.ndarray] = None


def _tri(rows, s):
    a = np.zeros((s, s))
    for i, r in enumerate(rows):
        a[i + 1, : len(r)] = r
    return a


def _dopri5() -> Tableau:
    c = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
    a = _tri(
        [
            [1 / 5],
            [3 / 40, 9 / 40],
            [44 / 45, -56 / 15, 32 / 9],
            [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
            [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
            [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
        ],
        7,
    )
    b = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
    b_hat = np.array(
        [
            5179 / 57600,
            0.0,
            7571 / 16695,
            393 / 640,
            -92097 / 339200,
            187 / 2100,
            1 / 40,
        ]
    )
    return Tableau("dopri5", 5, c, a, b, b - b_hat, fsal=True)


def _bosh3() -> Tableau:
    # Bogacki–Shampine 3(2)
    c = np.array([0.0, 1 / 2, 3 / 4, 1.0])
    a = _tri([[1 / 2], [0.0, 3 / 4], [2 / 9, 1 / 3, 4 / 9]], 4)
    b = np.array([2 / 9, 1 / 3, 4 / 9, 0.0])
    b_hat = np.array([7 / 24, 1 / 4, 1 / 3, 1 / 8])
    return Tableau("bosh3", 3, c, a, b, b - b_hat, fsal=True)


def _fehlberg2() -> Tableau:
    # Fehlberg RK1(2)
    c = np.array([0.0, 1 / 2, 1.0])
    a = _tri([[1 / 2], [1 / 256, 255 / 256]], 3)
    b = np.array([1 / 512, 255 / 256, 1 / 512])
    b_hat = np.array([1 / 256, 255 / 256, 0.0])
    return Tableau("fehlberg2", 2, c, a, b, b - b_hat)


def _adaptive_heun() -> Tableau:
    c = np.array([0.0, 1.0])
    a = _tri([[1.0]], 2)
    b = np.array([1 / 2, 1 / 2])
    b_hat = np.array([1.0, 0.0])
    return Tableau("adaptive_heun", 2, c, a, b, b - b_hat)


def _dopri8() -> Tableau:
    from scipy.integrate._ivp import dop853_coefficients as dc

    s = dc.N_STAGES  # 12
    a = np.zeros((s + 1, s + 1))
    a[:s, :s] = dc.A[:s, :s]
    c = np.concatenate([dc.C[:s], [1.0]])
    b = np.concatenate([dc.B, [0.0]])
    a[s, :s] = dc.B  # extra stage at t1 to expose FSAL slope f(t1, y1)
    err5 = np.concatenate([dc.E5[:s], [0.0]])
    err3 = np.concatenate([dc.E3[:s], [0.0]])
    # E rows include a final element for the appended f1 stage in scipy's
    # formulation (E has length N_STAGES + 1 where the last entry weights
    # f(t1, y1)); wire that to our appended stage.
    err5[s] = dc.E5[s]
    err3[s] = dc.E3[s]
    return Tableau(
        "dopri8",
        8,
        c,
        a,
        b,
        None,
        fsal=True,
        dop853_err=True,
        err5=err5,
        err3=err3,
    )


def _euler() -> Tableau:
    return Tableau("euler", 1, np.array([0.0]), np.zeros((1, 1)), np.array([1.0]), None)


def _midpoint() -> Tableau:
    c = np.array([0.0, 1 / 2])
    a = _tri([[1 / 2]], 2)
    return Tableau("midpoint", 2, c, a, np.array([0.0, 1.0]), None)


def _rk4() -> Tableau:
    c = np.array([0.0, 1 / 2, 1 / 2, 1.0])
    a = _tri([[1 / 2], [0.0, 1 / 2], [0.0, 0.0, 1.0]], 4)
    b = np.array([1 / 6, 1 / 3, 1 / 3, 1 / 6])
    return Tableau("rk4", 4, c, a, b, None)


_TABLEAUS = {
    "dopri5": _dopri5,
    "dopri8": _dopri8,
    "bosh3": _bosh3,
    "fehlberg2": _fehlberg2,
    "adaptive_heun": _adaptive_heun,
    "euler": _euler,
    "midpoint": _midpoint,
    "rk4": _rk4,
}


def get_tableau(name: str) -> Tableau:
    try:
        return _TABLEAUS[name]()
    except KeyError:
        raise ValueError(
            f"Unknown RK method {name!r}; available: {sorted(_TABLEAUS)}"
        ) from None
