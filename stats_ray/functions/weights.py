"""Glicko-based weighting and GXE (reference: stats/src/util.ts:410-419,
stats/src/stats.ts:245-270).

All functions are vectorized over numpy arrays so the enrich stage computes
every (player, cutoff) weight for a whole batch in a handful of kernels.
"""

from __future__ import annotations

import math

import numpy as np

from .erf import erf

# stats.ts:255-258 — provisional defaults and win/loss imputed ratings
DEFAULT_RPR = 1500.0
DEFAULT_RPRD = 130.0
IMPUTED_WIN_RPR = 1540.16061434
IMPUTED_LOSS_RPR = 1459.83938566
IMPUTED_RPRD = 122.858308077

_SQRT2 = math.sqrt(2.0)
_GXE_C = (3.0 * math.log(10.0) ** 2.0) / (400.0 * math.pi) ** 2


def weighting(rating, deviation, cutoff) -> np.ndarray:
    """w = (erf((r - cutoff)/rd/sqrt 2)+1)/2, zeroed when rd>100 & cutoff>1500
    (util.ts:416-419)."""
    rating = np.asarray(rating, dtype=np.float64)
    deviation = np.asarray(deviation, dtype=np.float64)
    w = (erf((rating - cutoff) / deviation / _SQRT2) + 1.0) / 2.0
    if np.isscalar(cutoff) or np.asarray(cutoff).ndim == 0:
        if cutoff > 1500:
            w = np.where(deviation > 100.0, 0.0, w)
    else:
        w = np.where((deviation > 100.0) & (np.asarray(cutoff) > 1500), 0.0, w)
    return w


def victory_chance(r1, d1, r2, d2) -> np.ndarray:
    """util.ts:410-414."""
    r1 = np.asarray(r1, dtype=np.float64)
    d1 = np.asarray(d1, dtype=np.float64)
    d = d1 ** 2.0 + np.asarray(d2, dtype=np.float64) ** 2.0
    return 1.0 / (1.0 + 10.0 ** ((np.asarray(r2, np.float64) - r1) / 400.0 / np.sqrt(1.0 + d * _GXE_C)))


def gxe(rpr, rprd) -> np.ndarray:
    """round(100 * victoryChance(rpr, rprd, 1500, 130)) with JS
    half-up rounding (stats.ts:141-143)."""
    vc = victory_chance(rpr, rprd, 1500.0, 130.0)
    return np.floor(100.0 * vc + 0.5)


def effective_rating(has_rating, rpr, rprd, outcome):
    """Resolve the (rpr, rprd, valid/save) triple per player
    (getWeights, stats.ts:245-262).

    has_rating : bool array — rating object present
    rpr, rprd  : float arrays (garbage where has_rating is False)
    outcome    : int8 array — 0 none/tie, 1 win, 2 loss

    Returns (rpr_eff, rprd_eff, valid) where valid == rating present and
    rprd != 0 (the 'save' flag).
    """
    has_rating = np.asarray(has_rating, dtype=bool)
    rpr = np.asarray(rpr, dtype=np.float64)
    rprd = np.asarray(rprd, dtype=np.float64)
    outcome = np.asarray(outcome)

    valid = has_rating & (rprd != 0.0)
    r = np.full(rpr.shape, DEFAULT_RPR)
    d = np.full(rpr.shape, DEFAULT_RPRD)
    r[valid] = rpr[valid]
    d[valid] = rprd[valid]

    imput = (~valid) & (outcome != 0)
    r[imput & (outcome == 1)] = IMPUTED_WIN_RPR
    r[imput & (outcome == 2)] = IMPUTED_LOSS_RPR
    d[imput] = IMPUTED_RPRD
    return r, d, valid
