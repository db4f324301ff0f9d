"""Mask/image discriminator with a gradient-reversal layer.

Ref: nnutils/discriminators.py. The GRL (identity forward, -lambda * grad
backward) lets the generator and discriminator share one optimizer, exactly
as in the reference (Ganin & Lempitsky 2015).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import flax.linen as nn


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, lambda_=1.0):
    return x


def _grl_fwd(x, lambda_):
    return x, None


def _grl_bwd(lambda_, _res, g):
    return (-lambda_ * g,)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


class Discriminator(nn.Module):
    """Conv stack -> logit (ref: nnutils/discriminators.py:61-86).

    Input NHWC with in_dim channels (1 for masks in s1, 3 for RGB in s2).
    """

    lambda_: float = 0.2
    in_dim: int = 1
    img_size: int = 256

    @nn.compact
    def __call__(self, imgs):
        x = gradient_reversal(imgs, self.lambda_)
        x = nn.Conv(32, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])(x)
        x = nn.relu(x)
        for feat in (64, 32, 32):
            x = nn.Conv(feat, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])(x)
            x = nn.relu(x)
        x = nn.Conv(1, (1, 1))(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1)(x)
