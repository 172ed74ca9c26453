"""Vectorized rational-Chebyshev erf (W. J. Cody, 1987).

Replicates the reference's erf (`stats/src/util.ts:421-527`, itself a
translation of netlib specfun) so Glicko weighting matches to the last ulp
of that approximation, vectorized over numpy arrays for batch use.
"""

from __future__ import annotations

import numpy as np

_MAX_NUM = float(2**53)
_THRESH = 0.46875
_SQRPI = 5.6418958354775628695e-1

_P0 = (3.1611237438705656, 1.13864154151050156e2, 3.77485237685302021e2,
       3.20937758913846947e3, 1.85777706184603153e-1)
_Q0 = (2.36012909523441209e1, 2.44024637934444173e2, 1.28261652607737228e3,
       2.84423683343917062e3)
_P1 = (5.64188496988670089e-1, 8.88314979438837594, 6.61191906371416295e1,
       2.98635138197400131e2, 8.8195222124176909e2, 1.71204761263407058e3,
       2.05107837782607147e3, 1.23033935479799725e3, 2.15311535474403846e-8)
_Q1 = (1.57449261107098347e1, 1.17693950891312499e2, 5.37181101862009858e2,
       1.62138957456669019e3, 3.29079923573345963e3, 4.36261909014324716e3,
       3.43936767414372164e3, 1.23033935480374942e3)
_P2 = (3.05326634961232344e-1, 3.60344899949804439e-1, 1.25781726111229246e-1,
       1.60837851487422766e-2, 6.58749161529837803e-4, 1.63153871373020978e-2)
_Q2 = (2.56852019228982242, 1.87295284992346047, 5.27905102951428412e-1,
       6.05183413124413191e-2, 2.33520497626869185e-3)


def _erf1(y: np.ndarray) -> np.ndarray:
    ysq = y * y
    xnum = _P0[4] * ysq
    xden = ysq.copy()
    for i in range(3):
        xnum = (xnum + _P0[i]) * ysq
        xden = (xden + _Q0[i]) * ysq
    return (y * (xnum + _P0[3])) / (xden + _Q0[3])


def _erfc2(y: np.ndarray) -> np.ndarray:
    xnum = _P1[8] * y
    xden = y.copy()
    for i in range(7):
        xnum = (xnum + _P1[i]) * y
        xden = (xden + _Q1[i]) * y
    result = (xnum + _P1[7]) / (xden + _Q1[7])
    ysq = np.floor(y * 16.0) / 16.0
    del_ = (y - ysq) * (y + ysq)
    return np.exp(-ysq * ysq) * np.exp(-del_) * result


def _erfc3(y: np.ndarray) -> np.ndarray:
    ysq = 1.0 / (y * y)
    xnum = _P2[5] * ysq
    xden = ysq.copy()
    for i in range(4):
        xnum = (xnum + _P2[i]) * ysq
        xden = (xden + _Q2[i]) * ysq
    result = (ysq * (xnum + _P2[4])) / (xden + _Q2[4])
    result = (_SQRPI - result) / y
    ysq2 = np.floor(y * 16.0) / 16.0
    del_ = (y - ysq2) * (y + ysq2)
    return np.exp(-ysq2 * ysq2) * np.exp(-del_) * result


def erf(x) -> np.ndarray:
    """Elementwise Cody erf over a float64 array (or scalar)."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x)
    y = np.abs(x)
    sign = np.sign(x)
    out = np.empty_like(y)

    big = y >= _MAX_NUM
    small = (~big) & (y <= _THRESH)
    mid = (~big) & (~small) & (y <= 4.0)
    tail = (~big) & (y > 4.0)

    if big.any():
        out[big] = 1.0
    if small.any():
        out[small] = _erf1(y[small])
    if mid.any():
        out[mid] = 1.0 - _erfc2(y[mid])
    if tail.any():
        out[tail] = 1.0 - _erfc3(y[tail])

    out *= sign
    return out[0] if scalar else out
