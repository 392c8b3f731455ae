"""Spatial domain decomposition of the 3-D double gyre over a device mesh.

The scaling-book recipe, applied to the basin model: pick a 1-D mesh over
the meridional (y) axis, annotate the prognostic fields with
``NamedSharding(P("y"))``, jit the *unmodified* step function with those
shardings, and let GSPMD insert the halo exchanges (collective-permutes for
the +-1 y-stencils) and the gather needed by the DCT free-surface matmul —
no manual halo code, no MPI. The per-device working set shrinks by the mesh
size, so basins far larger than one chip's HBM run unchanged.

This is a capability layer the reference does not have (it is single-process
Julia; SURVEY.md section 5): the multi-chip path for BASELINE.json's
"double-gyre + 1k-column ensemble" configuration.

Validated on a virtual 8-device CPU mesh (tests) and by the driver's
``dryrun_multichip``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from climateparameterizations_jl_tpu.embed.double_gyre import (
    DoubleGyreModel,
    DoubleGyreState,
    double_gyre_step,
)
from climateparameterizations_jl_tpu.parallel.sharding import make_mesh


def make_gyre_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the meridional axis (delegates to ``make_mesh``)."""
    return make_mesh(n_devices, axis_name="y")


def state_shardings(mesh: Mesh) -> DoubleGyreState:
    """Shardings for the prognostic fields: split the leading (y) axis.

    ``v`` sits on y-faces (``Ny + 1`` rows — not divisible by the mesh), so
    its *stored* copy is replicated; GSPMD still partitions the v-compute
    inside the jitted step, and the two Nz-sized fields that dominate memory
    (u, T) scale with the mesh.
    """
    shard = NamedSharding(mesh, P("y"))
    replicated = NamedSharding(mesh, P())
    return DoubleGyreState(u=shard, v=replicated, T=shard, eta=shard)


def shard_gyre_state(state: DoubleGyreState, mesh: Mesh) -> DoubleGyreState:
    """Place an (unsharded) state onto the mesh, y-partitioned."""
    s = state_shardings(mesh)
    return DoubleGyreState(
        u=jax.device_put(state.u, s.u),
        v=jax.device_put(state.v, s.v),
        T=jax.device_put(state.T, s.T),
        eta=jax.device_put(state.eta, s.eta),
    )


def make_sharded_gyre_stepper(
    model: DoubleGyreModel,
    mesh: Mesh,
    dt: float,
    nn=None,
    T_scaling=None,
    wT_scaling=None,
    n_substeps: int = 1,
    tridiag_backend: str = "scan",
    T_remap=None,
    nn_stability_gate=None,
):
    """jit the basin step with y-sharded state in/out; GSPMD does the halos.

    Returns ``step(state) -> state`` advancing ``n_substeps`` steps; inputs
    and outputs keep the y-sharded layout, so trajectories never gather onto
    one device. The NN-closure knobs (``T_remap``, ``nn_stability_gate``)
    mirror :func:`embed.double_gyre.double_gyre_step` — the sharded path must
    run the SAME closure the single-chip runner does (raw basin temperatures
    NaN multi-month runs without the remap; multi-decade runs drift without
    the gate — RESULTS.md gyre section).
    """
    s = state_shardings(mesh)

    def advance(state):
        # lax.scan, NOT a Python loop: unrolling traces n_substeps copies of
        # the whole step graph (compile time explodes at reference-scale
        # save intervals of thousands of steps).
        def body(st, _):
            return double_gyre_step(model, st, dt, nn, T_scaling, wT_scaling,
                                    tridiag_backend, T_remap, nn_stability_gate), None

        st, _ = jax.lax.scan(body, state, None, length=n_substeps)
        return st

    return jax.jit(advance, in_shardings=(s,), out_shardings=s)


def run_double_gyre_sharded(
    model: DoubleGyreModel,
    state0: DoubleGyreState,
    dt: float,
    n_save: int,
    save_every: int,
    mesh: Mesh | None = None,
    nn=None,
    T_scaling=None,
    wT_scaling=None,
    max_steps_per_dispatch: int | None = None,
    tridiag_backend: str = "scan",
    T_remap=None,
    nn_stability_gate=None,
):
    """Sharded counterpart of :func:`embed.double_gyre.run_double_gyre`.

    Saves frames on the host (numpy-convertible, y-sharded device arrays).
    Returns a :class:`DoubleGyreState` of stacked trajectories like the
    unsharded runner.
    """
    import jax.numpy as jnp

    mesh = mesh if mesh is not None else make_gyre_mesh()
    state = shard_gyre_state(state0, mesh)
    frames = [state]
    # Same device-program step cap as the unsharded runner: sparsely-saved
    # long runs must not build one multi-minute program per frame (remote
    # tunnels kill programs running >60-90 s).
    from climateparameterizations_jl_tpu.utils.dispatch import dispatch_plan

    kind, plan = dispatch_plan(
        n_save, save_every, model.Nx * model.Ny * model.Nz,
        max_frames_per_dispatch=1, max_steps_per_dispatch=max_steps_per_dispatch,
    )
    if kind == "subframe":
        steppers = {
            n: make_sharded_gyre_stepper(model, mesh, dt, nn, T_scaling, wT_scaling, n_substeps=n,
                                         tridiag_backend=tridiag_backend, T_remap=T_remap,
                                         nn_stability_gate=nn_stability_gate)
            for n in sorted(set(plan))
        }
        for _ in range(n_save):
            for n in plan:
                state = steppers[n](state)
            frames.append(state)
    else:
        step = make_sharded_gyre_stepper(model, mesh, dt, nn, T_scaling, wT_scaling, n_substeps=save_every,
                                         tridiag_backend=tridiag_backend, T_remap=T_remap,
                                         nn_stability_gate=nn_stability_gate)
        for _ in range(n_save):
            state = step(state)
            frames.append(state)
    stack = lambda f: jnp.stack([getattr(fr, f) for fr in frames], axis=0)  # noqa: E731
    return DoubleGyreState(u=stack("u"), v=stack("v"), T=stack("T"), eta=stack("eta"))
