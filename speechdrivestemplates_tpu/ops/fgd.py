"""Frechet Gesture Distance (the paper's FTD when used with the template VAE encoder).

Host-side float64 numpy/scipy, mirroring the reference's ``core/utils/fgd.py:6-64``
(which itself is the standard stable FID implementation): Gaussian fits of encoder
latents, then d^2 = ||mu1-mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)).  The matrix square
root runs on the host in float64 (scipy.linalg.sqrtm) for determinism — this is an
epoch-level metric, not a training-loop op, so it does not belong on the TPU.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)

    assert mu1.shape == mu2.shape, "mean vectors have different lengths"
    assert sigma1.shape == sigma2.shape, "covariances have different dimensions"

    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        # Near-singular product: jitter the diagonals (reference fgd.py:39-45).
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))

    if np.iscomplexobj(covmean):
        covmean = covmean.real

    tr_covmean = np.trace(covmean)
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


def compute_fgd(a: np.ndarray, b: np.ndarray) -> float:
    """FGD between two latent sets, each (N, D) (reference fgd.py:59-64)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mu_a, mu_b = a.mean(0), b.mean(0)
    sigma_a = np.cov(a, rowvar=False)
    sigma_b = np.cov(b, rowvar=False)
    return calculate_frechet_distance(mu_a, sigma_a, mu_b, sigma_b)
