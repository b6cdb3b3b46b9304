"""Data Banzhaf attribution (reference src/attributions/methods/databanzhaf.py:5-26).

Least-squares on {-1/2, +1/2}-shifted masks; the coefficients estimate
Banzhaf values of the underlying game (Wang & Jia 2023).
"""

from __future__ import annotations

import numpy as np


def data_banzhaf(x_train: np.ndarray, y_train: np.ndarray) -> np.ndarray:
    """x_train: (n, d) 0/1 masks; y_train: (n,). Returns (d,) coefficients."""
    shifted = np.asarray(x_train, np.float64) - 0.5
    y = np.asarray(y_train, np.float64)
    coef, *_ = np.linalg.lstsq(shifted.T @ shifted, shifted.T @ y, rcond=None)
    return coef
