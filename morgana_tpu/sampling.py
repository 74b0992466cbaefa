"""Latent-space sampling distributions for VAE exploration.

JAX rebuild of ``morgana/sampling.py``: samplers take an explicit PRNG key
(or draw one from the bound :func:`morgana_tpu.nn.next_rng` context), keeping
them usable both eagerly and inside jitted generation code.
"""
import math

import jax
import jax.numpy as jnp

from morgana_tpu import nn

__all__ = ['UniformSphereSurfaceSampler', 'UniformEllipsoidSurfaceApproximateSampler']


def _resolve_key(key):
    return nn.next_rng() if key is None else key


class UniformSphereSurfaceSampler(object):
    r"""Samples points uniformly on an n-dimensional sphere's surface
    (reference ``morgana/sampling.py:7-29``): a normalised Gaussian direction
    scaled by ``radius`` and offset by ``centre``."""

    def __init__(self, centre, radius):
        self.centre = jnp.asarray(centre)
        self.dim = self.centre.shape[-1]
        self.radius = radius

    def rsample(self, sample_shape=(), key=None):
        key = _resolve_key(key)
        direction = jax.random.normal(key, tuple(sample_shape) + (self.dim,))
        point = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
        return self.centre + self.radius * point

    sample = rsample


class UniformEllipsoidSurfaceApproximateSampler(object):
    r"""Samples points ~uniformly on an n-dimensional ellipsoid's surface via
    the n-sphere angle parameterisation (reference ``morgana/sampling.py:32-113``).

    Not a fair sampler: denser at the poles, especially for large radii dims.
    """

    def __init__(self, centre, radii):
        self.centre = jnp.asarray(centre)
        self.radii = jnp.asarray(radii)
        self.ndims = self.centre.shape[-1]

    def sample_angles(self, sample_shape, key):
        k_phi, k_theta = jax.random.split(key)
        phi = jax.random.uniform(k_phi, tuple(sample_shape) + (1,), minval=0., maxval=2 * math.pi)
        thetas = jax.random.uniform(
            k_theta, tuple(sample_shape) + (max(0, self.ndims - 2),), minval=0., maxval=math.pi)
        return jnp.concatenate((phi, thetas), axis=-1)

    def rsample(self, sample_shape=(), key=None):
        key = _resolve_key(key)
        angles = self.sample_angles(sample_shape, key)

        cumprod_sin = jnp.cumprod(jnp.sin(angles), axis=-1)
        cos = jnp.cos(angles)

        pad = jnp.ones_like(cumprod_sin[..., :1])
        cumprod_sin = jnp.concatenate((pad, cumprod_sin), axis=-1)
        cos_padded = jnp.concatenate((cos, pad), axis=-1)

        # Note: the reference does not offset by `centre` here
        # (``morgana/sampling.py:113``); behaviour preserved for parity.
        return self.radii * cumprod_sin * cos_padded

    sample = rsample
