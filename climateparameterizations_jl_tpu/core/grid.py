"""Staggered 1-D vertical grid for ocean-column models.

The column spans ``z in [-H, 0]`` with ``Nz`` cell centers and ``Nz + 1`` cell
faces. State variables (``u``, ``v``, ``T``) live on centers; vertical fluxes
(``u'w'``, ``v'w'``, ``w'T'``) and gradients live on faces.

Parity: the reference keeps the grid implicit in its dense ``Dᶜ``/``Dᶠ``
matrices and ``zC``/``zF`` vectors (reference ``src/differentiation_operators.jl``,
``wind_mixing/src/lesbrary_data.jl:156-157``). Here the grid is an explicit,
hashable static object so every downstream function can be jitted with the
grid as a compile-time constant.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np


@dataclasses.dataclass(frozen=True)
class ColumnGrid:
    """Uniform staggered z-grid of a single ocean column.

    Attributes:
      Nz: number of cell centers.
      H: domain depth (positive, meters). The column spans ``[-H, 0]``.
    """

    Nz: int
    H: float

    @property
    def dz(self) -> float:
        """Dimensional grid spacing (meters)."""
        return self.H / self.Nz

    @property
    def dz_hat(self) -> float:
        """Non-dimensional grid spacing ``dz / H = 1 / Nz``."""
        return 1.0 / self.Nz

    @cached_property
    def zc(self) -> np.ndarray:
        """Cell-center coordinates, ordered bottom (-H) to top (0)."""
        dz = self.dz
        return (np.arange(self.Nz, dtype=np.float64) + 0.5) * dz - self.H

    @cached_property
    def zf(self) -> np.ndarray:
        """Cell-face coordinates, ordered bottom (-H) to top (0)."""
        return np.arange(self.Nz + 1, dtype=np.float64) * self.dz - self.H

    def __hash__(self) -> int:
        return hash((self.Nz, self.H))
