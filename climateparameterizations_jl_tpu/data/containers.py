"""Column time-series containers and training-tensor assembly.

TPU-native re-design of the reference's data plumbing
(``wind_mixing/src/data_containers.jl:219-427``: ``FluxData`` / ``uvTData`` /
``ProfileData`` and the ``data()`` loader). Differences by design:

- Arrays are **time-major** ``(Nt, Nz)`` (the scan axis leads) instead of the
  reference's ``(Nz, Nt)`` matrices, and multiple simulations stack on a
  leading ``(S, ...)`` axis so one jitted program trains on the whole suite.
- Coarse-graining applies the precomputed weight matrices as one batched
  matmul over the whole time series (MXU) instead of a per-column loop
  (``data_containers.jl:343-360``).
- Scalings are pytree dataclasses shared between train and test sets
  (the reference's ``override_scalings`` semantics,
  ``data_containers.jl:379-403``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.core.coarse_grain import (
    coarse_grain_center,
    coarse_grain_linear_interpolation,
)
from climateparameterizations_jl_tpu.core.scalings import MinMaxScaling, ZeroMeanUnitVarianceScaling
from climateparameterizations_jl_tpu.models.wind_mixing import BoundaryConditions, WindMixingScalings


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ColumnTimeSeries:
    """One (or a stacked batch of) horizontally-averaged column simulation(s).

    Profiles are unscaled and time-major: ``u, v, T`` have shape
    ``(..., Nt, Nz)``; fluxes ``uw, vw, wT`` have ``(..., Nt, Nz + 1)``;
    ``t`` has ``(..., Nt)``. Constants are scalars (or ``(...,)`` batched).

    Parity: the ``LESbraryData`` fields (``wind_mixing/src/lesbrary_data.jl:9-54``)
    minus plotting baggage; ``theta_top`` is the kinematic surface heat flux
    derived from the buoyancy flux (``lesbrary_data.jl:164-165``),
    ``u_top`` the kinematic momentum flux, ``theta_bottom`` the bottom
    temperature gradient.
    """

    u: jnp.ndarray
    v: jnp.ndarray
    T: jnp.ndarray
    uw: jnp.ndarray
    vw: jnp.ndarray
    wT: jnp.ndarray
    t: jnp.ndarray
    H: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    alpha: jnp.ndarray
    beta: jnp.ndarray
    u_top: jnp.ndarray
    theta_top: jnp.ndarray
    theta_bottom: jnp.ndarray
    # Diurnal surface-flux amplitude (0 for constant-flux sims, None when
    # unknown, e.g. a raw LESbrary read outside the registry). Carried as a
    # DATA field so stacked suites can mix diurnal and constant members
    # per-sim; lets `enforce_surface_fluxes` refuse diurnal datasets and
    # `training_tensors` infer the cycle without a side-channel flag.
    diurnal_amplitude: jnp.ndarray | None = None

    @property
    def Nz(self) -> int:
        return self.T.shape[-1]

    @property
    def Nt(self) -> int:
        return self.T.shape[-2]


def coarsen_dataset(ds: ColumnTimeSeries, n: int = 32) -> ColumnTimeSeries:
    """Coarse-grain all profiles to ``n`` centers / ``n + 1`` faces.

    Cell fields are block-mean pooled; face fields use endpoint-preserving
    linear interpolation, matching the loader's choices
    (``data_containers.jl:343-360``).
    """
    return dataclasses.replace(
        ds,
        u=coarse_grain_center(ds.u, n),
        v=coarse_grain_center(ds.v, n),
        T=coarse_grain_center(ds.T, n),
        uw=coarse_grain_linear_interpolation(ds.uw, n + 1),
        vw=coarse_grain_linear_interpolation(ds.vw, n + 1),
        wT=coarse_grain_linear_interpolation(ds.wT, n + 1),
    )


def enforce_surface_fluxes(ds: ColumnTimeSeries) -> ColumnTimeSeries:
    """Pin the top face of ``uw``/``wT`` to the prescribed surface fluxes.

    Parity: ``enforce_top_surface_flux!`` (``data_containers.jl:282-294``).

    Refuses diurnal datasets: pinning their oscillating surface flux to the
    constant amplitude would silently destroy the cycle the diurnal model is
    supposed to learn (the CLAUDE.md "never enforce_surface_fluxes on
    diurnal sims" rule, enforced here rather than at call sites).
    """
    if ds.diurnal_amplitude is not None and bool(np.any(np.asarray(ds.diurnal_amplitude) != 0.0)):
        raise ValueError(
            "enforce_surface_fluxes on a diurnal dataset would pin the oscillating "
            "surface flux to a constant; skip it for diurnal sims"
        )
    uw = ds.uw.at[..., -1].set(jnp.broadcast_to(ds.u_top[..., None], ds.uw.shape[:-1]))
    wT = ds.wT.at[..., -1].set(jnp.broadcast_to(ds.theta_top[..., None], ds.wT.shape[:-1]))
    return dataclasses.replace(ds, uw=uw, wT=wT)


def stack_datasets(datasets: list[ColumnTimeSeries]) -> ColumnTimeSeries:
    """Stack same-shape simulations on a new leading axis (the suite axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *datasets)


_SCALE_TYPES = {
    "zero_mean_unit_variance": ZeroMeanUnitVarianceScaling,
    "min_max": MinMaxScaling,
}


def fit_wind_mixing_scalings(datasets, kind: str = "zero_mean_unit_variance") -> WindMixingScalings:
    """Fit per-variable scalings over the concatenation of all simulations.

    Parity: the per-variable ``scale_type(coarse)`` fits in
    ``data_containers.jl:379-394`` (fit on the coarse data of the *training*
    suite; reuse the returned object for test data).
    """
    if isinstance(datasets, ColumnTimeSeries):
        datasets = [datasets]
    cls = _SCALE_TYPES[kind]

    def fit(field):
        return cls.fit(jnp.concatenate([jnp.reshape(getattr(d, field), (-1,)) for d in datasets]))

    return WindMixingScalings(u=fit("u"), v=fit("v"), T=fit("T"), uw=fit("uw"), vw=fit("vw"), wT=fit("wT"))


def scaled_state_array(ds: ColumnTimeSeries, scalings: WindMixingScalings) -> jnp.ndarray:
    """Scaled state ``x = [u; v; T]`` time series, shape ``(..., Nt, 3 Nz)``."""
    return jnp.concatenate(
        [scalings.u.scale(ds.u), scalings.v.scale(ds.v), scalings.T.scale(ds.T)], axis=-1
    )


def scaled_flux_arrays(ds: ColumnTimeSeries, scalings: WindMixingScalings):
    """Scaled flux faces ``(uw, vw, wT)`` each ``(..., Nt, Nz + 1)``."""
    return (
        scalings.uw.scale(ds.uw),
        scalings.vw.scale(ds.vw),
        scalings.wT.scale(ds.wT),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainingBatch:
    """Everything one NDE training step consumes, for ``S`` simulations.

    ``x0``: ``(S, 3 Nz)`` scaled initial states at ``tsteps[0]``.
    ``targets``: ``(S, Nt_sel, 3 Nz)`` scaled trajectories at the selected steps.
    ``bcs``: batched :class:`BoundaryConditions` with ``(S,)`` fields.
    ``t``: ``(Nt_sel,)`` non-dimensional save times (shared across sims).
    ``tau``: time scale used for non-dimensionalization.
    ``t0``: optional ``(S,)`` per-row absolute start times overriding
    ``t[0]`` — multiple-shooting batches put every (sim, window) pair on
    the batch axis, so rows start at different absolute times (the diurnal
    top-BC phase must track the true window start, not a shared ``t[0]``).
    """

    x0: jnp.ndarray
    targets: jnp.ndarray
    bcs: BoundaryConditions
    t: jnp.ndarray
    tau: jnp.ndarray
    t0: jnp.ndarray | None = None


def training_tensors(ds: ColumnTimeSeries, scalings: WindMixingScalings, tsteps, tau=None, diurnal: bool | None = None) -> TrainingBatch:
    """Build NDE training tensors from a stacked suite ``(S, Nt, ...)``.

    Parity: the ``uvT0s`` / ``uvT_trains`` / ``BCs`` assembly in
    ``NDE_training.jl:220-243`` (initial state at ``tsteps[0]``, targets at
    all ``tsteps``, BCs frozen at the window start), with time
    non-dimensionalized by ``tau`` = full simulation span by default.
    ``diurnal=True`` fills ``bcs.diurnal_amplitude`` with the dataset's
    per-sim heat-flux amplitude (``ds.diurnal_amplitude``, falling back to
    ``theta_top``) so a ``diurnal`` model resolves the sinusoidal top BC in
    time (``data_containers.jl:131-156``); constant-flux members of a mixed
    suite carry amplitude 0 and keep their frozen BC. The default
    ``diurnal=None`` infers the flag from ``ds.diurnal_amplitude``.
    """
    if diurnal is None:
        diurnal = ds.diurnal_amplitude is not None and bool(
            np.any(np.asarray(ds.diurnal_amplitude) != 0.0)
        )
    n_frames = ds.t.shape[-1]
    t_arr = np.asarray(tsteps)
    if int(t_arr.max()) >= n_frames or int(t_arr.min()) < 0:
        raise ValueError(
            f"tsteps range [{int(t_arr.min())}, {int(t_arr.max())}] out of range for {n_frames} saved frames"
        )
    tsteps = jnp.asarray(tsteps)
    x = scaled_state_array(ds, scalings)  # (S, Nt, 3Nz)
    uw_s, vw_s, wT_s = scaled_flux_arrays(ds, scalings)

    t_row = ds.t[0] if ds.t.ndim > 1 else ds.t
    if tau is None:
        tau = jnp.abs(t_row[-1] - t_row[0])

    i0 = tsteps[0]
    bcs = BoundaryConditions(
        uw_bot=uw_s[..., i0, 0],
        uw_top=uw_s[..., i0, -1],
        vw_bot=vw_s[..., i0, 0],
        vw_top=vw_s[..., i0, -1],
        wT_bot=wT_s[..., i0, 0],
        wT_top=wT_s[..., i0, -1],
        diurnal_amplitude=(
            jnp.broadcast_to(
                jnp.asarray(ds.diurnal_amplitude if ds.diurnal_amplitude is not None else ds.theta_top),
                uw_s[..., i0, 0].shape,
            )
            if diurnal
            else jnp.zeros_like(uw_s[..., i0, 0])
        ),
    )
    return TrainingBatch(
        x0=x[..., i0, :],
        targets=jnp.take(x, tsteps, axis=-2),
        bcs=bcs,
        t=jnp.take(t_row, tsteps) / tau,
        tau=tau,
    )


def multiple_shooting_tensors(
    ds: ColumnTimeSeries,
    scalings: WindMixingScalings,
    tsteps,
    n_windows: int,
    tau=None,
    diurnal: bool | None = None,
) -> TrainingBatch:
    """Window-parallel (multiple-shooting) training tensors.

    Splits the saveat ladder ``tsteps`` into ``n_windows`` truth-anchored
    segments and puts every ``(sim, window)`` pair on the BATCH axis: the
    sequential scan length per train step drops ``n_windows``-fold while the
    batch widens ``n_windows``-fold — the TPU-first redesign of the
    reference's full-window stage (``train_NDE_args.jl:197`` trains
    ``1:9:1153`` as one 1,152-step sequential solve; the forward path
    absorbs 32k columns at 36% MFU, so trading scan length for batch width
    is nearly free on the chip).

    Each window starts from the TRUTH state at its first frame; adjacent
    windows SHARE their boundary frame, so every window's loss includes the
    frame the next window is anchored at (continuity-to-truth is penalized
    without an extra term — the curriculum's early stages train exactly
    such windows). Per-window BC faces are frozen at the window start
    (the generalization of ``training_tensors``'s window-start freeze);
    diurnal members carry per-row absolute start times in ``t0`` so the
    sinusoidal top BC keeps its true phase in every window.

    ``tsteps`` must be uniformly strided and its interval count divisible
    by ``n_windows``. Row order is sims-major: row ``s * n_windows + k``.
    """
    if diurnal is None:
        diurnal = ds.diurnal_amplitude is not None and bool(
            np.any(np.asarray(ds.diurnal_amplitude) != 0.0)
        )
    t_arr = np.asarray(tsteps)
    n_frames = ds.t.shape[-1]
    if int(t_arr.max()) >= n_frames or int(t_arr.min()) < 0:
        raise ValueError(
            f"tsteps range [{int(t_arr.min())}, {int(t_arr.max())}] out of range for {n_frames} saved frames"
        )
    strides = np.diff(t_arr)
    if strides.size == 0 or not np.all(strides == strides[0]):
        raise ValueError(f"multiple shooting needs a uniformly strided tstep ladder (got strides {strides[:4]}...)")
    n_intervals = len(t_arr) - 1
    if n_windows < 1 or n_intervals % n_windows:
        raise ValueError(
            f"n_windows={n_windows} must divide the {n_intervals} save intervals of the tstep ladder"
        )
    n_int = n_intervals // n_windows  # save intervals per window
    K, W = n_windows, n_int + 1
    # (K, W) frame indices; window k covers [k*n_int, (k+1)*n_int] inclusive.
    idx = t_arr[np.arange(K)[:, None] * n_int + np.arange(W)[None, :]]

    x = scaled_state_array(ds, scalings)  # (S, Nt, 3Nz)
    if x.ndim == 2:  # single sim: add the suite axis
        x = x[None]
        ds = jax.tree.map(lambda a: jnp.asarray(a)[None], ds)
    S = x.shape[0]
    uw_s, vw_s, wT_s = scaled_flux_arrays(ds, scalings)

    t_row = ds.t.reshape(-1, ds.t.shape[-1])[0]
    if tau is None:
        tau = jnp.abs(t_row[-1] - t_row[0])

    starts = jnp.asarray(idx[:, 0])  # (K,) window-start frames
    merge = lambda a: a.reshape((S * K,) + a.shape[2:])  # noqa: E731 — sims-major rows

    def at_starts(flux_faces, face):
        # (S, Nt, Nz+1) -> (S, K) values of the boundary face at each start.
        return merge(jnp.take(flux_faces[..., face], starts, axis=-1))

    amp = jnp.broadcast_to(
        jnp.asarray(ds.diurnal_amplitude if ds.diurnal_amplitude is not None else ds.theta_top),
        (S,),
    )
    bcs = BoundaryConditions(
        uw_bot=at_starts(uw_s, 0),
        uw_top=at_starts(uw_s, -1),
        vw_bot=at_starts(vw_s, 0),
        vw_top=at_starts(vw_s, -1),
        wT_bot=at_starts(wT_s, 0),
        wT_top=at_starts(wT_s, -1),
        diurnal_amplitude=(
            merge(jnp.broadcast_to(amp[:, None], (S, K))) if diurnal
            else jnp.zeros((S * K,), x.dtype)
        ),
    )
    targets = merge(jnp.take(x, jnp.asarray(idx.ravel()), axis=-2).reshape(x.shape[0], K, W, x.shape[-1]))
    t0_nondim = jnp.take(t_row, starts) / tau  # (K,)
    return TrainingBatch(
        x0=targets[:, 0, :],
        targets=targets,
        bcs=bcs,
        t=jnp.take(t_row, jnp.asarray(idx[0])) / tau,
        tau=tau,
        t0=merge(jnp.broadcast_to(t0_nondim[None, :], (S, K))),
    )


def direct_regression_pairs(ds: ColumnTimeSeries, scalings: WindMixingScalings, flux: str = "wT"):
    """(predictor, target) pairs for direct flux regression.

    Predictors are scaled states ``(S * Nt, 3 Nz)``; targets the scaled flux
    faces ``(S * Nt, Nz + 1)``. Parity: the ``training_data`` pairs in
    ``FluxData`` (``data_containers.jl:410-414``).
    """
    if flux not in ("uw", "vw", "wT"):
        raise KeyError(f"flux must be one of uw/vw/wT, got {flux!r}")
    x = scaled_state_array(ds, scalings)
    y = getattr(scalings, flux).scale(getattr(ds, flux))  # only the requested flux
    return x.reshape(-1, x.shape[-1]), y.reshape(-1, y.shape[-1])
