"""NDE-profile evaluation: trained closure vs physics baselines vs truth.

TPU-native re-design of the reference's evaluation harness ``NDE_profile``
(``wind_mixing/src/training_postprocessing.jl:250-632``): for one held-out
simulation it produces

- the **NDE** solution (trained NNs + mPP base closure),
- the **mPP-only** solution (zeroed NNs, ``training_postprocessing.jl:326-352``),
- the **KPP** baseline (``training_postprocessing.jl:368-388``),
- per-timestep 6-channel losses for each vs the LES truth,
- total / NN-only flux decompositions along each trajectory
  (``training_postprocessing.jl:474-496``),
- local-Richardson-number diagnostics for each,

collected into one flat dict-of-arrays (the reference's ~40-key output Dict,
``training_postprocessing.jl:534-631``). Unlike the reference — which re-runs
each solver one column at a time on the host — every trajectory here comes
out of a single jitted ``lax.scan`` and the diagnostics are one batched
``vmap`` over the saved frames.

``free_convection_profile`` is the analogous harness for the
free-convection workload (``free_convection/test_free_convection_nde.jl:110-165``:
truth vs NDE vs conv-adj-only vs KPP vs TKE).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.data.containers import (
    ColumnTimeSeries,
    TrainingBatch,
    training_tensors,
)
from climateparameterizations_jl_tpu.models.free_convection import (
    FreeConvectionModel,
    diagnose_wT,
    solve_free_convection_nde,
)
from climateparameterizations_jl_tpu.models.wind_mixing import (
    BoundaryConditions,
    FluxNNs,
    WindMixingModel,
    _nn_fluxes,
    join_uvT,
    predict_flux,
    solve_wind_mixing_nde,
    solve_wind_mixing_split,
    split_uvT,
)
from climateparameterizations_jl_tpu.physics.kpp import (
    KPPForcing,
    KPPParameters,
    KPPState,
    kpp_diagnostic_fluxes,
    solve_kpp,
)
from climateparameterizations_jl_tpu.physics.richardson import richardson_profile
from climateparameterizations_jl_tpu.physics.tke import TKEParameters, TKEState, solve_tke


def _per_timestep_channels(pred, target, Nz: int, dz_hat: float):
    """Per-timestep (u, v, T, du/dz, dv/dz, dT/dz) MSE channels.

    ``pred``/``target``: scaled states ``(Nt, 3 Nz)`` (time-major). Returns a
    dict of six ``(Nt,)`` arrays — the reference's per-timestep loss channels
    (``training_postprocessing.jl:390-470``).
    """
    from climateparameterizations_jl_tpu.core.operators import d_center_to_face

    pu, pv, pT = split_uvT(pred, Nz)
    tu, tv, tT = split_uvT(target, Nz)
    msE = lambda a, b: jnp.mean((a - b) ** 2, axis=-1)  # noqa: E731
    dz = lambda a: d_center_to_face(a, dz_hat)  # noqa: E731
    return {
        "u": msE(pu, tu),
        "v": msE(pv, tv),
        "T": msE(pT, tT),
        "du": msE(dz(pu), dz(tu)),
        "dv": msE(dz(pv), dz(tv)),
        "dT": msE(dz(pT), dz(tT)),
    }


@dataclasses.dataclass
class ProfileEvaluation:
    """Flat bag of evaluation arrays (numpy); see :func:`nde_profile`."""

    data: dict

    def __getitem__(self, key):
        return self.data[key]

    def keys(self):
        return self.data.keys()

    def to_dict(self) -> dict:
        return dict(self.data)


def _require_uniform(t, where: str):
    """Fixed-step solvers integrate on a uniform save grid; reject silently
    misaligned (non-uniform) tstep selections."""
    dt = np.diff(np.asarray(t, np.float64))
    if dt.size and not np.allclose(dt, dt[0], rtol=1e-4, atol=0.0):
        raise ValueError(f"{where}: tsteps must be uniformly spaced (got save intervals {dt[:4]}...)")


def _solve_scaled(model, nns, bcs, x0, t, solver, n_substeps):
    t0 = t[0]
    dt_save = t[1] - t[0]
    n_save = t.shape[0] - 1
    if solver == "split":
        return solve_wind_mixing_split(model, nns, bcs, x0, t0, dt_save, n_save, n_substeps=n_substeps)
    if solver not in ("rk4", "euler", "heun"):
        raise ValueError(f"unknown solver {solver!r} (expected split/rk4/euler/heun)")
    # Evaluation is forward-only: unroll the substep scan (+3% measured).
    return solve_wind_mixing_nde(
        model, nns, bcs, x0, t0, dt_save, n_save, n_substeps=n_substeps, method=solver, unroll=4
    )


def _grid(model):
    """(zc, zf) cell-center / face depth arrays for the model's column."""
    Nz = model.Nz
    zc = np.asarray((jnp.arange(Nz) + 0.5) / Nz * model.H - model.H)
    zf = np.asarray(jnp.arange(Nz + 1) / Nz * model.H - model.H)
    return zc, zf


def _ri(model: WindMixingModel, u, v, T):
    """Ri channel of a SCALED (u, v, T) trajectory; eps matches _face_nu's 1e-7."""
    s = model.scalings
    return richardson_profile(u, v, T, model.H, model.g, model.alpha, s.u.sigma, s.v.sigma, s.T.sigma, eps=1e-7)


def _trajectory_diagnostics(model: WindMixingModel, nns: FluxNNs, bcs: BoundaryConditions, traj, t):
    """Fluxes (total + NN-only, unscaled) and Ri along a scaled trajectory."""
    s = model.scalings

    def frame(x, ti):
        uw, vw, wT = predict_flux(model, nns, bcs, x, ti)
        nn_uw, nn_vw, nn_wT = _nn_fluxes(model, nns, bcs, x)
        return uw, vw, wT, nn_uw, nn_vw, nn_wT

    uw, vw, wT, nn_uw, nn_vw, nn_wT = jax.vmap(frame)(traj, t)
    u, v, T = split_uvT(traj, model.Nz)
    Ri = _ri(model, u, v, T)
    # Dimensionalization matches the model's face convention: zero-weights
    # mode assembles faces in the LINEAR F/sigma convention (BC face =
    # bc - scale(0) = F_bc/sigma), so affine unscale would bias every face
    # by +mu; non-zero-weights faces are affine-scaled.
    if model.zero_weights:
        dim = lambda sc, y: sc.sigma * y  # noqa: E731
    else:
        dim = lambda sc, y: sc.unscale(y)  # noqa: E731
    return {
        "uw": dim(s.uw, uw),
        "vw": dim(s.vw, vw),
        "wT": dim(s.wT, wT),
        # NN contribution in dimensional units: sigma * (scaled NN face flux)
        # — the decomposition of training_postprocessing.jl:474-496.
        "nn_uw": s.uw.sigma * nn_uw,
        "nn_vw": s.vw.sigma * nn_vw,
        "nn_wT": s.wT.sigma * nn_wT,
        "Ri": Ri,
    }


def nde_profile(
    model: WindMixingModel,
    nns: FluxNNs,
    ds_test: ColumnTimeSeries,
    tsteps,
    *,
    solver: str = "split",
    n_substeps: int = 4,
    kpp_params: KPPParameters | None = None,
    include_kpp: bool = True,
    include_embedded: bool = False,
    embedded_substeps: int = 10,
    kpp_n_substeps: int = 1,
) -> ProfileEvaluation:
    """Full comparison harness for one held-out wind-mixing simulation.

    ``model.scalings`` must be the *training* scalings (the reference's
    ``override_scalings`` semantics). ``tsteps`` selects the evaluation
    window out of ``ds_test``'s frames.

    ``kpp_n_substeps``: inner KPP steps per save interval. The default 1
    steps KPP at the save spacing — exactly what the reference's harness
    does (``column_model_1D_kpp`` takes ``dt = times[2] - times[1]``,
    ``wind_mixing/src/k_profile_parameterization.jl:51``), which on a
    strided trange is coarser than KPP's usual 600 s. Pass the eval stride
    here to give KPP its reference-native 600 s step (a FAIRER baseline on
    strided evaluations; see RESULTS.md).

    Parity: ``NDE_profile`` (``training_postprocessing.jl:250-632``).
    """
    # This harness evaluates ONE simulation: the solvers return TIME-leading
    # trajectories while training_tensors stacks targets BATCH-leading, so a
    # stacked suite would silently broadcast the per-timestep channels into a
    # meaningless (Nt, Nt) cross-time matrix. Squeeze a singleton stack
    # (stack_datasets stacks every leaf); reject anything larger.
    if ds_test.u.ndim > 2:
        if ds_test.u.shape[0] != 1:
            raise ValueError(
                f"nde_profile evaluates ONE held-out simulation; got a stacked suite "
                f"of {ds_test.u.shape[0]} (run each simulation through its own profile)"
            )
        ds_test = jax.tree.map(lambda a: a[0], ds_test)
    s = model.scalings
    batch: TrainingBatch = training_tensors(ds_test, s, tsteps, tau=model.tau, diurnal=model.diurnal)
    t = batch.t
    _require_uniform(t, "nde_profile")
    t_dim = np.asarray(t) * float(model.tau)
    Nz = model.Nz

    # --- the three solves (each one jitted scan) -------------------------
    traj_nde = _solve_scaled(model, nns, batch.bcs, batch.x0, t, solver, n_substeps)
    zero_nns = FluxNNs(uw=None, vw=None, wT=None)
    traj_mpp = _solve_scaled(model, zero_nns, batch.bcs, batch.x0, t, solver, n_substeps)

    truth = batch.targets

    zc, zf = _grid(model)
    out: dict = {
        "t": t_dim,
        "zc": zc,
        "zf": zf,
    }

    def unpack(name, traj):
        u, v, T = split_uvT(traj, Nz)
        out[f"{name}_u"] = np.asarray(s.u.unscale(u))
        out[f"{name}_v"] = np.asarray(s.v.unscale(v))
        out[f"{name}_T"] = np.asarray(s.T.unscale(T))

    unpack("truth", truth)
    unpack("nde", traj_nde)
    unpack("mpp", traj_mpp)

    # Truth fluxes over the window.
    for name in ("uw", "vw", "wT"):
        out[f"truth_{name}"] = np.asarray(jnp.take(getattr(ds_test, name), jnp.asarray(tsteps), axis=-2))

    # --- flux + Ri diagnostics along each trajectory ---------------------
    for name, traj, dnns in (("nde", traj_nde, nns), ("mpp", traj_mpp, zero_nns)):
        diag = _trajectory_diagnostics(model, dnns, batch.bcs, traj, t)
        for k, v in diag.items():
            out[f"{name}_{k}"] = np.asarray(v)
    u_t, v_t, T_t = split_uvT(truth, Nz)
    out["truth_Ri"] = np.asarray(
        _ri(model, u_t, v_t, T_t)
    )

    # --- per-timestep loss channels --------------------------------------
    for name, traj in (("nde", traj_nde), ("mpp", traj_mpp)):
        for k, v in _per_timestep_channels(traj, truth, Nz, model.dz_hat).items():
            out[f"losses_{name}_{k}"] = np.asarray(v)

    # --- KPP baseline -----------------------------------------------------
    if include_kpp:
        kpp_params = kpp_params if kpp_params is not None else KPPParameters.default()
        i0 = np.asarray(tsteps)[0]
        state0 = KPPState(
            U=ds_test.u[..., i0, :],
            V=ds_test.v[..., i0, :],
            T=ds_test.T[..., i0, :],
        )
        forcing = KPPForcing(
            Fu=ds_test.u_top,
            Fb=ds_test.theta_top * ds_test.g * ds_test.alpha,
            dTdz_bottom=ds_test.theta_bottom,
        )
        kpp = solve_kpp(
            state0, t_dim, kpp_params, forcing, model.H, Nz, ds_test.f, ds_test.g, ds_test.alpha,
            n_substeps=kpp_n_substeps,
            diurnal=model.diurnal,  # Fb becomes the daily-cycle amplitude
        )
        out["kpp_u"], out["kpp_v"], out["kpp_T"] = (np.asarray(kpp.U), np.asarray(kpp.V), np.asarray(kpp.T))
        kpp_scaled = join_uvT(s.u.scale(kpp.U), s.v.scale(kpp.V), s.T.scale(kpp.T))
        for k, v in _per_timestep_channels(kpp_scaled, truth, Nz, model.dz_hat).items():
            out[f"losses_kpp_{k}"] = np.asarray(v)
        # KPP flux + Ri diagnostics along the trajectory (the reference's
        # test_uw_kpp/test_Ri_kpp channels, training_postprocessing.jl:368-388).
        # For diurnal sims the diagnostics use the SAME time-varying flux as
        # the solve (Fb per saved frame), not the constant amplitude.
        forcing_diag = forcing
        if model.diurnal:
            from climateparameterizations_jl_tpu.core.constants import diurnal_cycle

            cyc = diurnal_cycle(jnp.asarray(t_dim, kpp.T.dtype))
            # Left-align the time axis against (Nt, ..., Nz) trajectories.
            cyc = cyc.reshape(cyc.shape + (1,) * (kpp.T.ndim - 2))
            forcing_diag = KPPForcing(
                Fu=forcing.Fu, Fb=forcing.Fb * cyc, dTdz_bottom=forcing.dTdz_bottom,
            )
        kpp_uw, kpp_vw, kpp_wT = kpp_diagnostic_fluxes(
            kpp.U, kpp.V, kpp.T,
            jnp.asarray(out["zf"], kpp.T.dtype), jnp.asarray(out["zc"], kpp.T.dtype),
            kpp_params, forcing_diag, ds_test.g, ds_test.alpha, model.H, Nz,
        )
        out["kpp_uw"], out["kpp_vw"], out["kpp_wT"] = (np.asarray(kpp_uw), np.asarray(kpp_vw), np.asarray(kpp_wT))
        u_k, v_k, T_k = split_uvT(kpp_scaled, Nz)
        out["kpp_Ri"] = np.asarray(
            _ri(model, u_k, v_k, T_k)
        )

    # --- embedded host-model run (dimensional column, implicit mPP) ------
    # Parity: solve_oceananigans_modified_pacanowski_philander_nn +
    # NDE_profile_oceananigans (``training_postprocessing.jl:634-1156``) —
    # the same NNs run inside the host column model, baseline and +NN.
    if include_embedded:
        from climateparameterizations_jl_tpu.embed.column_model import (
            HostColumnState,
            host_for_wind_mixing,
            run_paired_columns,
        )

        # Shared train/eval host construction (base physics matches the NDE's
        # training-time base; NN faces dimensionalize by the training
        # convention; per-sim diurnal amplitudes keep constant members of a
        # mixed suite on their frozen flux) — see host_for_wind_mixing.
        host = host_for_wind_mixing(
            model, ds_test.u_top, ds_test.theta_top, ds_test.theta_bottom,
            diurnal_amplitude=ds_test.diurnal_amplitude,
        )
        i0 = int(np.asarray(tsteps)[0])
        state0 = HostColumnState(
            u=ds_test.u[..., i0, :], v=ds_test.v[..., i0, :], T=ds_test.T[..., i0, :]
        )
        n_frames = len(t_dim) - 1
        dt_emb = (t_dim[-1] - t_dim[0]) / (n_frames * embedded_substeps)
        baseline, with_nn = run_paired_columns(
            host, nns, state0, jnp.asarray(dt_emb, state0.T.dtype), n_frames, embedded_substeps,
            t0=float(t_dim[0]),
        )
        from climateparameterizations_jl_tpu.embed.column_model import diagnose_host_fluxes

        t_frames = jnp.asarray(t_dim, state0.T.dtype)
        for name, sol, run_nns in (("embedded_baseline", baseline, None), ("embedded", with_nn, nns)):
            u, v, T = (jnp.moveaxis(a, 0, -2) for a in (sol.u, sol.v, sol.T))
            out[f"{name}_u"], out[f"{name}_v"], out[f"{name}_T"] = (
                np.asarray(u), np.asarray(v), np.asarray(T),
            )
            scaled = join_uvT(s.u.scale(u), s.v.scale(v), s.T.scale(T))
            for k, val in _per_timestep_channels(scaled, truth, Nz, model.dz_hat).items():
                out[f"losses_{name}_{k}"] = np.asarray(val)
            # Embedded flux + Ri diagnostics (NDE_oceananigans.jl:157-286).
            frame = lambda st, ti: diagnose_host_fluxes(host, run_nns, st, ti)  # noqa: E731
            uw_e, vw_e, wT_e = jax.vmap(frame)(sol, t_frames)
            out[f"{name}_uw"] = np.asarray(jnp.moveaxis(uw_e, 0, -2))
            out[f"{name}_vw"] = np.asarray(jnp.moveaxis(vw_e, 0, -2))
            out[f"{name}_wT"] = np.asarray(jnp.moveaxis(wT_e, 0, -2))
            u_e, v_e, T_e = split_uvT(scaled, Nz)
            out[f"{name}_Ri"] = np.asarray(
                _ri(model, u_e, v_e, T_e)
            )

    _add_scalar_aggregates(out)
    return ProfileEvaluation(out)


def _add_scalar_aggregates(out: dict) -> None:
    """Scalar ``loss_{m}`` / ``loss_{m}_gradient`` per comparison member
    (the reference's summary entries, ``training_postprocessing.jl:534-631``)."""
    members = sorted({k[len("losses_") : -2] for k in out if k.startswith("losses_") and k.endswith("_u")})
    for m in members:
        out[f"loss_{m}"] = float(np.mean([out[f"losses_{m}_{c}"] for c in ("u", "v", "T")]))
        out[f"loss_{m}_gradient"] = float(np.mean([out[f"losses_{m}_{c}"] for c in ("du", "dv", "dT")]))


def nde_profile_from_saved(sim_dir: str, model: WindMixingModel, ds_truth: ColumnTimeSeries, tsteps) -> ProfileEvaluation:
    """Assemble the embedded comparison from SAVED ``.jld2`` simulation files.

    Parity: ``NDE_profile_oceananigans`` (``training_postprocessing.jl:808-1156``)
    — the reference's eval path that reads the baseline / +NN Oceananigans
    outputs back off disk instead of re-running them. ``sim_dir`` must hold
    ``baseline.jld2`` and ``neural_network.jld2`` as written by
    ``evaluate --embedded --write-jld2`` (or the original Julia code's
    JLD2OutputWriter — the reader handles the LESbrary layout either way).
    Profiles are compared against ``ds_truth`` at the saved times; returns
    the same ``embedded_* / embedded_baseline_*`` channels as
    :func:`nde_profile`'s in-memory path plus per-timestep loss channels.
    """
    import os

    from climateparameterizations_jl_tpu.data.lesbrary import read_les_profiles

    s = model.scalings
    Nz = model.Nz
    batch: TrainingBatch = training_tensors(ds_truth, s, tsteps, tau=model.tau)
    truth = batch.targets
    if truth.ndim == 3 and truth.shape[0] == 1:
        truth = truth[0]
    if truth.ndim != 2:
        raise ValueError(
            f"nde_profile_from_saved compares one saved run against ONE truth simulation; "
            f"got a stacked suite of {truth.shape[0]} (pass a single-sim ds_truth)"
        )
    t_truth = np.asarray(batch.t, np.float64) * float(model.tau)
    zc, zf = _grid(model)
    out: dict = {
        "t": t_truth,
        "zc": zc,
        "zf": zf,
    }

    def unpack_truth(name, traj):
        u, v, T = split_uvT(traj, Nz)
        out[f"{name}_u"] = np.asarray(s.u.unscale(u))
        out[f"{name}_v"] = np.asarray(s.v.unscale(v))
        out[f"{name}_T"] = np.asarray(s.T.unscale(T))

    unpack_truth("truth", truth)

    for tag, name in (("baseline", "embedded_baseline"), ("neural_network", "embedded")):
        saved = read_les_profiles(os.path.join(sim_dir, f"{tag}.jld2"))
        # Align by TIME, not by index: the saved file may use any save
        # interval (ours or the Julia JLD2OutputWriter's).
        t_saved = np.asarray(saved.t, np.float64).reshape(-1)
        tol = 1e-3 * max(float(np.max(t_truth) - np.min(t_truth)), 1.0) / max(len(t_truth) - 1, 1)
        idx = np.abs(t_saved[None, :] - t_truth[:, None]).argmin(axis=1)
        err = np.abs(t_saved[idx] - t_truth)
        if np.any(err > tol):
            raise ValueError(
                f"{tag}.jld2 save times do not cover the requested evaluation times "
                f"(worst mismatch {err.max():.3g} s); saved t in [{t_saved.min():.3g}, {t_saved.max():.3g}]"
            )
        u, v, T = (np.asarray(a).reshape(-1, *a.shape[-1:])[idx] for a in (saved.u, saved.v, saved.T))
        out[f"{name}_u"], out[f"{name}_v"], out[f"{name}_T"] = u, v, T
        for flux in ("uw", "vw", "wT"):
            arr = np.asarray(getattr(saved, flux))
            out[f"{name}_{flux}"] = arr.reshape(-1, arr.shape[-1])[idx]
        scaled = join_uvT(s.u.scale(jnp.asarray(u)), s.v.scale(jnp.asarray(v)), s.T.scale(jnp.asarray(T)))
        for k, val in _per_timestep_channels(scaled, truth, Nz, model.dz_hat).items():
            out[f"losses_{name}_{k}"] = np.asarray(val)
        u_e, v_e, T_e = split_uvT(scaled, Nz)
        out[f"{name}_Ri"] = np.asarray(
            _ri(model, u_e, v_e, T_e)
        )
    _add_scalar_aggregates(out)
    return ProfileEvaluation(out)


def free_convection_profile(
    model: FreeConvectionModel,
    nn,
    ds_test: ColumnTimeSeries,
    tsteps,
    *,
    n_substeps: int = 2,
    solver: str = "split",
    kpp_params: KPPParameters | None = None,
    tke_params: TKEParameters | None = None,
    include_kpp: bool = True,
    include_tke: bool = True,
    include_embedded: bool = False,
    embedded_substeps: int = 10,
    kpp_n_substeps: int = 1,
    tke_n_substeps: int | None = None,
) -> ProfileEvaluation:
    """Free-convection comparison: truth vs NDE vs conv-adj-only vs KPP vs TKE.

    ``kpp_n_substeps``: see :func:`nde_profile` — 1 matches the reference's
    harness (KPP stepped at the save spacing). ``tke_n_substeps`` defaults to
    ``kpp_n_substeps`` so one knob makes both physics baselines run at their
    reference-native step on strided evaluations.

    Parity: the solution table assembled by
    ``free_convection/test_free_convection_nde.jl:110-165`` (true / NDE /
    KPP / TKE / convective-adjustment solutions + per-sim losses).
    """
    # One simulation only (same reason as nde_profile: solver output is
    # time-leading, truth is batch-leading — a stacked suite would broadcast
    # the loss channels into a meaningless cross-time matrix).
    if ds_test.T.ndim > 2:
        if ds_test.T.shape[0] != 1:
            raise ValueError(
                f"free_convection_profile evaluates ONE held-out simulation; got a stacked "
                f"suite of {ds_test.T.shape[0]} (run each simulation through its own profile)"
            )
        ds_test = jax.tree.map(lambda a: a[0], ds_test)
    tsteps = np.asarray(tsteps)
    T_truth = jnp.take(ds_test.T, jnp.asarray(tsteps), axis=-2)
    t_row = ds_test.t[0] if ds_test.t.ndim > 1 else ds_test.t
    t_dim = np.asarray(jnp.take(t_row, jnp.asarray(tsteps)))
    _require_uniform(t_dim, "free_convection_profile")
    t_hat = jnp.asarray(t_dim) / model.tau
    dt_save = t_hat[1] - t_hat[0]
    n_save = t_hat.shape[0] - 1

    T0_scaled = model.T_scaling.scale(T_truth[..., 0, :])
    Nz = model.Nz

    zc, zf = _grid(model)
    out: dict = {
        "t": t_dim,
        "zc": zc,
        "zf": zf,
        "truth_T": np.asarray(T_truth),
        "truth_wT": np.asarray(jnp.take(ds_test.wT, jnp.asarray(tsteps), axis=-2)),
    }

    # The NN-free member is the conv-adj baseline only when the model's base
    # IS convective adjustment; for --base-closure none it is a zero-closure
    # run (surface fluxes only) and is labeled "base" so the loss matrix
    # can't pass it off as a physics baseline.
    base_label = "conv_adj" if model.base_closure == "convective_adjustment" else "base"
    runs = {"nde": nn, base_label: None}
    mse_t = lambda a, b: np.asarray(jnp.mean((a - b) ** 2, axis=-1))  # noqa: E731
    T_truth_scaled = model.T_scaling.scale(T_truth)
    for name, run_nn in runs.items():
        traj = solve_free_convection_nde(model, run_nn, T0_scaled, t_hat[0], dt_save, n_save, n_substeps=n_substeps, method=solver)
        out[f"{name}_T"] = np.asarray(model.T_scaling.unscale(traj))
        out[f"{name}_wT"] = np.asarray(model.wT_scaling.unscale(diagnose_wT(model, run_nn, traj)))
        out[f"losses_{name}_T"] = mse_t(traj, T_truth_scaled)

    zeros = jnp.zeros_like(T_truth[..., 0, :])
    if include_kpp:
        kpp_params = kpp_params if kpp_params is not None else KPPParameters.default()
        forcing = KPPForcing(
            Fu=jnp.zeros_like(ds_test.u_top),
            Fb=ds_test.theta_top * ds_test.g * ds_test.alpha,
            dTdz_bottom=ds_test.theta_bottom,
        )
        kpp = solve_kpp(
            KPPState(U=zeros, V=zeros, T=T_truth[..., 0, :]),
            t_dim, kpp_params, forcing, model.H, Nz, ds_test.f, ds_test.g, ds_test.alpha,
            n_substeps=kpp_n_substeps,
        )
        out["kpp_T"] = np.asarray(kpp.T)
        out["losses_kpp_T"] = mse_t(model.T_scaling.scale(kpp.T), T_truth_scaled)
        # Heat-flux diagnostic incl. the nonlocal term — the wT output of
        # free_convection_kpp (k_profile_parameterization.jl:3-47).
        _, _, kpp_wT = kpp_diagnostic_fluxes(
            kpp.U, kpp.V, kpp.T,
            jnp.asarray(out["zf"], kpp.T.dtype), jnp.asarray(out["zc"], kpp.T.dtype),
            kpp_params, forcing, ds_test.g, ds_test.alpha, model.H, Nz,
        )
        out["kpp_wT"] = np.asarray(kpp_wT)

    if include_tke:
        tke_params = tke_params if tke_params is not None else TKEParameters.default()
        tke = solve_tke(
            TKEState(U=zeros, V=zeros, T=T_truth[..., 0, :], e=jnp.full_like(zeros, 1e-6)),
            t_dim, tke_params,
            jnp.zeros_like(ds_test.u_top), ds_test.theta_top * ds_test.g * ds_test.alpha,
            model.H, Nz, ds_test.f, ds_test.g, ds_test.alpha,
            n_substeps=tke_n_substeps if tke_n_substeps is not None else kpp_n_substeps,
            # Same fixed-gradient bottom BC as the KPP baseline above.
            dTdz_bottom=ds_test.theta_bottom,
        )
        out["tke_T"] = np.asarray(tke.T)
        out["losses_tke_T"] = mse_t(model.T_scaling.scale(tke.T), T_truth_scaled)
        # Heat-flux diagnostic (the wT output of free_convection_tke_mass_flux).
        from climateparameterizations_jl_tpu.physics.tke import tke_diagnostic_heat_flux

        out["tke_wT"] = np.asarray(
            tke_diagnostic_heat_flux(
                tke, model.H / Nz, tke_params,
                ds_test.theta_top * ds_test.g * ds_test.alpha, ds_test.g, ds_test.alpha,
            )
        )

    # --- embedded host column: conv-adj baseline vs conv-adj + NN --------
    # Parity: ``oceananigans_convective_adjustment_nn``
    # (``free_convection/src/oceananigans_nn.jl:42-211``) — the trained NN as
    # a forcing in a dimensional column with implicit convective adjustment.
    if include_embedded:
        from climateparameterizations_jl_tpu.embed.column_model import (
            HostColumnState,
            host_for_free_convection,
            run_paired_columns,
        )

        dtype = T_truth.dtype
        # The ONE shared host construction (also the a-posteriori trainer's):
        # base-free checkpoints embed over a zero-physics host, see builder.
        host = host_for_free_convection(
            model, ds_test.f, ds_test.g, ds_test.alpha,
            Ftheta=ds_test.theta_top, dTdz_bottom=ds_test.theta_bottom,
        )
        state0 = HostColumnState(
            u=jnp.zeros_like(T_truth[..., 0, :]),
            v=jnp.zeros_like(T_truth[..., 0, :]),
            T=T_truth[..., 0, :],
        )
        dt_emb = (t_dim[-1] - t_dim[0]) / (n_save * embedded_substeps)
        baseline, with_nn = run_paired_columns(
            host, FluxNNs(uw=None, vw=None, wT=nn), state0,
            jnp.asarray(dt_emb, dtype), n_save, embedded_substeps,
        )
        for name, sol in (("embedded_baseline", baseline), ("embedded", with_nn)):
            T_emb = jnp.moveaxis(sol.T, 0, -2)
            out[f"{name}_T"] = np.asarray(T_emb)
            out[f"losses_{name}_T"] = mse_t(model.T_scaling.scale(T_emb), T_truth_scaled)
        # The NN heat-flux diagnostic the reference stores next to the
        # embedded solution (oceananigans_nn.jl:184-192, diagnose_wT_NN).
        from climateparameterizations_jl_tpu.embed.column_model import diagnose_nn_heat_flux

        wT_emb = diagnose_nn_heat_flux(host, FluxNNs(uw=None, vw=None, wT=nn), jnp.asarray(out["embedded_T"]))
        out["embedded_wT"] = np.asarray(wT_emb)

    return ProfileEvaluation(out)
