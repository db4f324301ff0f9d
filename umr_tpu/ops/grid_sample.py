"""Bilinear grid sampling (the torch `grid_sample` used throughout the ref).

One shared implementation backs every sampling site in the reference:
texture-flow sampling (ref: nnutils/geom_utils.py:41-59), distance-transform
sampling (ref: nnutils/loss_utils.py:50-90), UV sampling of the flow image
(ref: nnutils/cub_mesh.py:156), semantic-UV ops (ref: experiments/avg_uv.py),
and keypoint transfer (ref: experiments/test_kp.py:131-153).

Convention matches torch<=1.2 (the reference pins torch 1.1):
align_corners=True, zero padding. Layout is TPU-native channel-last.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(image, grid, align_corners=True):
    """Bilinearly sample `image` at normalized coordinates `grid`.

    image: [B, H, W, C]
    grid:  [B, ..., 2] with (x, y) in [-1, 1]; x indexes W, y indexes H.
    returns: [B, ..., C]

    Out-of-range samples contribute zeros (torch padding_mode='zeros').
    """
    B, H, W, C = image.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(B, -1, 2)
    x, y = g[..., 0], g[..., 1]

    if align_corners:
        xf = (x + 1.0) * 0.5 * (W - 1)
        yf = (y + 1.0) * 0.5 * (H - 1)
    else:
        xf = ((x + 1.0) * W - 1.0) * 0.5
        yf = ((y + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = xf - x0
    wy1 = yf - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        # [B, N, C] gather via flat batched take
        flat = image.reshape(B, H * W, C)
        idx = iyc * W + ixc
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None]

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out.reshape(out_shape)


def sample_textures(texture_flow, images):
    """Sample per-face texel colors from an image via a predicted flow.

    texture_flow: [B, F, T, T, 2] in [-1, 1]
    images:       [B, H, W, C]
    returns:      [B, F, T, T, C]
    Ref: nnutils/geom_utils.py:41-59.
    """
    B, F, T = texture_flow.shape[:3]
    flat = texture_flow.reshape(B, F * T * T, 2)
    samples = grid_sample(images, flat)
    return samples.reshape(B, F, T, T, -1)


def identity_grid(H, W, align_corners=True, dtype=jnp.float32):
    """The identity affine grid: [H, W, 2] with (x, y) in [-1, 1].

    Matches torch affine_grid(identity) under torch<=1.2 semantics
    (align_corners=True): linspace(-1, 1, size).
    Ref: soft_rasterize.py:57-62, utils/kp_utils.py:13-24.
    """
    if align_corners:
        ys = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
        xs = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
    else:
        ys = (jnp.arange(H, dtype=dtype) * 2 + 1 - H) / H
        xs = (jnp.arange(W, dtype=dtype) * 2 + 1 - W) / W
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)
