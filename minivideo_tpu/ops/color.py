"""Device color conversion: planar YCbCr 4:2:0 -> interleaved RGB888.

The SURVEY §7 architecture mapping puts pixel conversion on device
(reference mb_to_rgb, export_utils.c:209-326: integer BT.601 studio
swing, coefficients 298/409/100/208/516 >> 8): after the fused
reconstruction kernel leaves Y/Cb/Cr in HBM, the conversion is a
handful of VPU elementwise ops XLA fuses into one pass — so RGB export
pipelines ship interleaved bytes straight off the chip instead of
paying a host-side numpy pass per frame.

Bit-compatible with export/image.py yuv420_to_rgb (the host/reference
path); tests/test_export_apps.py pins batched device output against it
elementwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=())
def yuv420_to_rgb_device(y: jnp.ndarray, cb: jnp.ndarray,
                         cr: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] u8 luma + [B, H/2, W/2] u8 chroma -> [B, H, W, 3] u8.

    Integer BT.601 studio swing, identical rounding/clipping to the
    reference's mb_to_rgb and the host converter."""
    # 2x2 nearest-neighbor chroma upsample (reference repeats the
    # chroma sample across the 2x2 luma block), cropped to the luma
    # plane like the host converter (odd luma dimensions)
    h, w = y.shape[1], y.shape[2]
    cb_up = jnp.repeat(jnp.repeat(cb, 2, axis=1), 2, axis=2)[:, :h, :w]
    cr_up = jnp.repeat(jnp.repeat(cr, 2, axis=1), 2, axis=2)[:, :h, :w]
    c = y.astype(jnp.int32) - 16
    d = cb_up.astype(jnp.int32) - 128
    e = cr_up.astype(jnp.int32) - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)
