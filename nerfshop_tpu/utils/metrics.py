"""Image quality metrics (parity with scripts/common.py:190-264 of the
reference: MSE/PSNR/SSIM/L1/MAPE/SMAPE/RelMSE; numpy, host-side)."""

from __future__ import annotations

import numpy as np


def luminance(img: np.ndarray) -> np.ndarray:
    return 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]


def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    m = mse(a, b)
    return float(10 * np.log10(max_val**2 / max(m, 1e-12)))


def l1(a, b) -> float:
    return float(np.mean(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


def mape(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.mean(np.abs(a - b) / (np.abs(b) + 1e-2)))


def smape(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.mean(2 * np.abs(a - b) / (np.abs(a) + np.abs(b) + 1e-2)))


def relative_mse(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2 / (b**2 + 1e-2)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def _filter2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """'valid' 2D correlation per channel via FFT-free sliding windows."""
    from numpy.lib.stride_tricks import sliding_window_view

    kh, kw = kernel.shape
    win = sliding_window_view(img, (kh, kw), axis=(0, 1))
    if img.ndim == 3:
        return np.einsum("ijckl,kl->ijc", win, kernel)
    return np.einsum("ijkl,kl->ij", win, kernel)


def ssim(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Standard single-scale SSIM with 11×11 gaussian window (Wang et al.)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        return float(np.mean([ssim(a[..., c], b[..., c], max_val) for c in range(a.shape[-1])]))
    k = _gaussian_kernel()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _filter2d(a, k)
    mu_b = _filter2d(b, k)
    var_a = _filter2d(a * a, k) - mu_a**2
    var_b = _filter2d(b * b, k) - mu_b**2
    cov = _filter2d(a * b, k) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(np.mean(s))


ALL_METRICS = {
    "MSE": mse,
    "PSNR": psnr,
    "SSIM": ssim,
    "L1": l1,
    "MAPE": mape,
    "SMAPE": smape,
    "MRSE": relative_mse,
}


def compute_error(metric: str, a: np.ndarray, b: np.ndarray) -> float:
    return ALL_METRICS[metric.upper()](a, b)
