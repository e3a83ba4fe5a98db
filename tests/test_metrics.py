"""Metric library (P5) including the FLIP perceptual metric."""

import numpy as np

from nerfshop_tpu.utils import metrics


def test_psnr_ssim_basics():
    a = np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert metrics.psnr(a, a) > 80
    assert abs(metrics.ssim(a, a) - 1.0) < 1e-6
    b = np.clip(a + 0.1, 0, 1)
    assert metrics.psnr(a, b) < 25


def test_flip_properties():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    # identical images → ~0
    assert metrics.flip(a, a) < 1e-6
    # small perturbation → small FLIP; large → larger
    small = metrics.flip(np.clip(a + 0.02, 0, 1), a)
    big = metrics.flip(np.clip(a + 0.4, 0, 1), a)
    assert 0 <= small < big <= 1.0, (small, big)
    # inverted image → large error
    assert metrics.flip(1.0 - a, a) > 0.2


def test_flip_in_registry():
    a = np.zeros((16, 16, 3), np.float32)
    b = np.ones((16, 16, 3), np.float32) * 0.5
    v = metrics.compute_error("FLIP", a, b)
    assert 0 < v <= 1
