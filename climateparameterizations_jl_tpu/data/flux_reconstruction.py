"""Budget-based reconstruction of turbulent fluxes from mean profiles.

Parity: reference ``wind_mixing/src/data_containers.jl:172-217``
(``reconstruct_flux_profiles``): given mean profiles ``u, v, T`` on
``(Nt, Nz)``, recover the fluxes from the horizontally-averaged budgets

    d(uw)/dz = -du/dt + f v
    d(vw)/dz = -dv/dt - f u
    d(wT)/dz = -dT/dt

then integrate vertically, ``w'phi'(z) = int_bottom^z d(w'phi')/dz' dz'``
(zero bottom flux). The reference's per-element Julia loops become a
time-difference + a single ``cumsum`` along z — fully batched.

Arrays here are time-major ``(..., Nt, Nz)``; the result drops the last
timestep (one-sided time difference) exactly like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def reconstruct_flux_profiles(u, v, T, t, f, dz):
    """Return ``(u, v, T, uw, vw, wT, t)`` with ``Nt - 1`` steps.

    Args:
      u, v, T: ``(..., Nt, Nz)`` unscaled mean profiles.
      t: ``(..., Nt)`` times.
      f: Coriolis parameter.
      dz: grid spacing (uniform).
    """
    dt = jnp.diff(t, axis=-1)[..., :, None]  # (..., Nt-1, 1)

    ddt = lambda A: (A[..., 1:, :] - A[..., :-1, :]) / dt  # noqa: E731
    dudt, dvdt, dTdt = ddt(u), ddt(v), ddt(T)

    u_, v_, T_ = u[..., :-1, :], v[..., :-1, :], T[..., :-1, :]

    duw_dz = -dudt + f * v_
    dvw_dz = -dvdt - f * u_
    dwT_dz = -dTdt

    def integrate(div):
        # Faces: flux[0] = 0; flux[k] = sum_{j<k} dz * div[j].
        interior = jnp.cumsum(div, axis=-1) * dz
        zero = jnp.zeros_like(interior[..., :1])
        return jnp.concatenate([zero, interior], axis=-1)

    return u_, v_, T_, integrate(duw_dz), integrate(dvw_dz), integrate(dwT_dz), t[..., :-1]
