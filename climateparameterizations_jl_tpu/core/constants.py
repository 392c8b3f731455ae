"""Shared physical constants and the diurnal surface-flux cycle.

One definition of the reference's sinusoidal daily forcing
``Q(t) = amplitude * sin(2 pi t / day)`` (``wind_mixing/src/data_containers.jl:131-156``)
so the NDE, the host column, the KPP baseline, and the LES generator stay in
exact phase/sign agreement.
"""

from __future__ import annotations

import jax.numpy as jnp

SECONDS_PER_DAY = 86400.0


def diurnal_cycle(t):
    """``sin(2 pi t / day)`` for dimensional time ``t`` [s] (positive first
    half-day = the cooling phase under the LESbrary sign convention)."""
    return jnp.sin(2.0 * jnp.pi * t / SECONDS_PER_DAY)
