"""Progressive render buffer: spp accumulation + tonemap + color space.

TPU-side analog of CudaRenderBuffer (render_buffer.h:160-265,
src/render_buffer.cu): frame/depth buffers at render resolution, an
accumulation buffer for progressive spp, EMA blending after the first few
samples, exposure + tonemap + sRGB on readout. DLSS is intentionally absent
(dynamic resolution + accumulation cover the use case on TPU; SURVEY V6)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.common import ColorSpace, TonemapCurve
from nerfshop_tpu.ops import tonemap as tm


@dataclass
class RenderBuffer:
    resolution: Tuple[int, int]  # (W, H)
    accumulate_rgba: Optional[jnp.ndarray] = None  # [H, W, 4] linear accum
    depth: Optional[jnp.ndarray] = None  # [H, W]
    spp: int = 0

    def clear(self) -> None:
        W, H = self.resolution
        self.accumulate_rgba = jnp.zeros((H, W, 4), jnp.float32)
        self.depth = jnp.zeros((H, W), jnp.float32)
        self.spp = 0

    def resize(self, resolution: Tuple[int, int]) -> None:
        if resolution != self.resolution:
            self.resolution = resolution
            self.clear()

    def accumulate(self, frame_rgba: jnp.ndarray, depth: Optional[jnp.ndarray] = None) -> None:
        """Running average over samples-per-pixel (render_buffer.cu
        accumulate: mean for the first 256 spp, EMA beyond)."""
        if self.accumulate_rgba is None:
            self.clear()
        n = self.spp
        w_new = 1.0 / (n + 1) if n < 256 else 1.0 / 256
        self.accumulate_rgba = self.accumulate_rgba * (1.0 - w_new) + frame_rgba * w_new
        if depth is not None:
            self.depth = self.depth * (1.0 - w_new) + depth * w_new
        self.spp = n + 1

    def tonemapped(
        self,
        exposure: float = 0.0,
        curve: TonemapCurve = TonemapCurve.Identity,
        output_srgb: bool = True,
        input_is_srgb_space: bool = False,
    ) -> jnp.ndarray:
        """→ display-ready [H, W, 4].

        ``input_is_srgb_space``: LDR-trained NeRFs already predict sRGB-space
        radiance (linear_colors=false); skip the transfer curve then."""
        img = self.accumulate_rgba
        rgb = img[..., :3] * (2.0**exposure)
        if not input_is_srgb_space:
            rgb = tm.apply_tonemap(rgb, curve)
            if output_srgb:
                rgb = tm.linear_to_srgb(rgb)
        rgb = jnp.clip(rgb, 0.0, 1.0)
        return jnp.concatenate([rgb, jnp.clip(img[..., 3:], 0.0, 1.0)], -1)


def overlay_ground_truth(pred: "jnp.ndarray", gt: "jnp.ndarray", mode: str = "split") -> "jnp.ndarray":
    """GT comparison overlays (reference: render_frame tail — GT half-screen
    overlay and false-color error map, src/testbed.cu:2761+).

    pred/gt: [H, W, 3or4] in display space. ``mode``:
      * "split": left half GT, right half prediction;
      * "error": false-color |pred − gt| (blue → red);
      * "blend": 50/50 blend.
    """
    import jax.numpy as jnp

    p = pred[..., :3]
    g = gt[..., :3]
    if g.shape[:2] != p.shape[:2]:
        import jax

        g = jax.image.resize(g, (*p.shape[:2], 3), "linear")
    if mode == "split":
        W = p.shape[1]
        mask = (jnp.arange(W) < W // 2)[None, :, None]
        out = jnp.where(mask, g, p)
    elif mode == "error":
        err = jnp.clip(jnp.abs(p - g).mean(-1, keepdims=True) * 4.0, 0.0, 1.0)
        # blue (low) → green → red (high)
        out = jnp.concatenate(
            [err, 1.0 - jnp.abs(2 * err - 1.0), 1.0 - err], axis=-1
        ) * jnp.ones_like(p)
    elif mode == "blend":
        out = 0.5 * p + 0.5 * g
    else:
        raise ValueError(mode)
    alpha = pred[..., 3:4] if pred.shape[-1] == 4 else jnp.ones_like(out[..., :1])
    return jnp.concatenate([out, jnp.ones_like(alpha)], -1)
