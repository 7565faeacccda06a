"""Evaluation metrics: PSNR (reference nerf/utils.py:351-387), SSIM, and an
optional LPIPS meter.

LPIPS in the reference uses lpips-vgg with downloaded weights
(utils.py:389-427); in offline environments the weights are unavailable, so
`LPIPSMeter` degrades to unavailable and reports nothing rather than failing.
SSIM (left commented-out in the reference, utils.py:429-465) is implemented
here for a weight-free perceptual-ish signal.
"""

from __future__ import annotations



import numpy as np


class Meter:
    name = "meter"

    def __init__(self):
        self.V = 0.0
        self.N = 0

    def clear(self):
        self.V, self.N = 0.0, 0

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def update(self, preds: np.ndarray, truths: np.ndarray):
        raise NotImplementedError

    def report(self) -> str:
        return f"{self.name} = {self.measure():.6f}"


class PSNRMeter(Meter):
    name = "PSNR"

    def update(self, preds: np.ndarray, truths: np.ndarray):
        preds = np.asarray(preds, np.float32)
        truths = np.asarray(truths, np.float32)
        mse = np.mean((preds - truths) ** 2)
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        self.V += psnr
        self.N += 1


def ssim(img0: np.ndarray, img1: np.ndarray, max_val: float = 1.0) -> float:
    """Standard single-scale SSIM with 11x11 gaussian window (per channel, averaged)."""
    from scipy.ndimage import uniform_filter

    img0 = np.asarray(img0, np.float64)
    img1 = np.asarray(img1, np.float64)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    size = 7

    def f(x):
        return uniform_filter(x, size=(size, size, 1))

    mu0, mu1 = f(img0), f(img1)
    s00 = f(img0 * img0) - mu0 * mu0
    s11 = f(img1 * img1) - mu1 * mu1
    s01 = f(img0 * img1) - mu0 * mu1
    num = (2 * mu0 * mu1 + C1) * (2 * s01 + C2)
    den = (mu0 ** 2 + mu1 ** 2 + C1) * (s00 + s11 + C2)
    return float(np.mean(num / den))


class SSIMMeter(Meter):
    name = "SSIM"

    def update(self, preds: np.ndarray, truths: np.ndarray):
        self.V += ssim(preds, truths)
        self.N += 1


class LPIPSMeter(Meter):
    """LPIPS-vgg if torch + lpips + weights are available; otherwise falls
    back to the weight-free perceptual proxy used by the lambda_lpips
    training loss (utils/losses.perceptual_loss), reported as
    'LPIPS (proxy)' so results are never silently conflated with lpips-vgg."""
    name = "LPIPS (vgg)"

    def __init__(self):
        super().__init__()
        self.fn = None
        self._proxy = None
        try:  # pragma: no cover - env-dependent
            import lpips
            import torch
            self.fn = lpips.LPIPS(net="vgg")
            self._torch = torch
        except Exception:
            self.fn = None
        if self.fn is None:
            import jax
            from .losses import perceptual_loss
            self.name = "LPIPS (proxy)"
            self._proxy = jax.jit(perceptual_loss)

    @property
    def available(self) -> bool:
        return self.fn is not None or self._proxy is not None

    def update(self, preds: np.ndarray, truths: np.ndarray):
        if self.fn is None:
            if self._proxy is not None:
                self.V += float(self._proxy(
                    np.asarray(preds, np.float32),
                    np.asarray(truths, np.float32)))
                self.N += 1
            return
        t = self._torch
        p = t.from_numpy(np.asarray(preds, np.float32)).permute(2, 0, 1)[None] * 2 - 1
        g = t.from_numpy(np.asarray(truths, np.float32)).permute(2, 0, 1)[None] * 2 - 1
        with t.no_grad():
            self.V += float(self.fn(p, g))
        self.N += 1
