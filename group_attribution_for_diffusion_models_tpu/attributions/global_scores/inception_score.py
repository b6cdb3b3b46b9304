"""Inception Score from classifier logits.

Same KL formulation as reference src/attributions/global_scores/
inception_score.py:15-76: IS = exp(E_x KL(p(y|x) || p(y))), computed over
`splits` chunks with mean/std. Operates on an (N, num_classes) logit matrix
so the InceptionV3 forward (one XLA graph, bilinear 299 resize inside) stays
separate and the math is exactly testable.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def inception_score_from_logits(
    logits: np.ndarray, splits: int = 10
) -> Tuple[float, float]:
    logits = np.asarray(logits, dtype=np.float64)
    logits = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(logits)
    probs /= probs.sum(axis=1, keepdims=True)

    # Fewer samples than splits would yield empty chunks (nan scores).
    splits = max(1, min(splits, len(probs)))
    scores = []
    for chunk in np.array_split(probs, splits):
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = chunk * (np.log(chunk + 1e-16) - np.log(marginal + 1e-16))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    scores = np.asarray(scores)
    return float(scores.mean()), float(scores.std())
