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
    """

    x0: jnp.ndarray
    targets: jnp.ndarray
    bcs: BoundaryConditions
    t: jnp.ndarray
    tau: jnp.ndarray


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
