"""Masked sequence losses (reference API path ``morgana.losses``).

Thin re-export of :mod:`morgana_tpu.ops.losses` so both
``from morgana_tpu import losses`` and ``import morgana_tpu.losses`` work.
"""
from morgana_tpu.ops.losses import (  # noqa: F401
    sequence_loss, mse, bce, ce, kld_standard_normal, KLD_standard_normal,
)

__all__ = ['sequence_loss', 'mse', 'bce', 'ce', 'kld_standard_normal',
           'KLD_standard_normal']
