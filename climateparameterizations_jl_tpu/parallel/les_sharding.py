"""Spatial domain decomposition of the 3-D LES over a device mesh.

Same recipe as the gyre (``parallel/gyre_sharding.py``), applied to the
training-data generator (``data/les.py``): 1-D mesh over the meridional (y)
axis, prognostic fields annotated ``NamedSharding(P("y"))``, and the
*unmodified* ``les_step`` jitted under those shardings. GSPMD then inserts

- collective-permutes for the ±1 y-stencils (``jnp.roll`` halos),
- the all-to-alls the horizontal ``rfft2``/``irfft2`` of the pressure
  Poisson solve needs (the z-tridiagonal stays local: its batch axes are
  the sharded (ky, kx) modes),

so a 256^3 LES runs across a pod slice with no manual halo or transpose
code. Per-device memory scales down by the mesh size.

Validated against the single-device stepper on a virtual 8-device CPU mesh
(``tests/test_les.py::TestShardedLES``) and in ``dryrun_multichip``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from climateparameterizations_jl_tpu.data.les import LESConfig, LESState, les_step


def make_les_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the meridional (y) axis (delegates to ``make_mesh``)."""
    from climateparameterizations_jl_tpu.parallel.sharding import make_mesh

    return make_mesh(n_devices, axis_name="y")


def state_shardings(mesh: Mesh) -> LESState:
    """Split every prognostic field's leading (y) axis across the mesh."""
    shard = NamedSharding(mesh, P("y"))
    return LESState(u=shard, v=shard, w=shard, T=shard)


def shard_les_state(state: LESState, mesh: Mesh) -> LESState:
    s = state_shardings(mesh)
    return LESState(
        u=jax.device_put(state.u, s.u),
        v=jax.device_put(state.v, s.v),
        w=jax.device_put(state.w, s.w),
        T=jax.device_put(state.T, s.T),
    )


def make_sharded_les_stepper(
    config: LESConfig,
    mesh: Mesh,
    dt: float,
    method: str = "rk3",
    n_substeps: int = 1,
):
    """jit ``les_step`` with y-sharded state in/out (GSPMD halos + FFT a2a).

    ``config.Ny`` must be divisible by the mesh size. Returns
    ``step(state, t) -> state`` advancing ``n_substeps`` steps from
    simulation time ``t``; input and output stay y-sharded.
    """
    if config.Ny % mesh.devices.size != 0:
        raise ValueError(f"Ny={config.Ny} not divisible by mesh size {mesh.devices.size}")
    s = state_shardings(mesh)
    repl = NamedSharding(mesh, P())

    def advance(state, t):
        # lax.scan, NOT a Python loop (see make_sharded_gyre_stepper).
        def body(carry, _):
            st, tc = carry
            return (les_step(config, st, dt, method, tc), tc + dt), None

        (st, _), _ = jax.lax.scan(body, (state, t), None, length=n_substeps)
        return st

    return jax.jit(advance, in_shardings=(s, repl), out_shardings=s)
