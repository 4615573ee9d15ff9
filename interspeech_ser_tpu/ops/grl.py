"""Gradient reversal (Ganin) as a jax.custom_vjp.

TPU-native equivalent of reference src/modules/grl.py:8-36 and the second
implementation in src/ns3/gradient_reversal.py:6-30: identity forward,
gradient scaled by -λ in backward.
"""

from __future__ import annotations

import jax


@jax.custom_vjp
def gradient_reversal(x, lambda_reversal: float = 1.0):
    return x


def _fwd(x, lambda_reversal):
    return x, lambda_reversal


def _bwd(lambda_reversal, g):
    return (-lambda_reversal * g, None)


gradient_reversal.defvjp(_fwd, _bwd)
