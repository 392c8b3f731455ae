"""Free-convection dataset helpers: the 9 LESbrary simulations.

Parity: ``free_convection/src/data.jl`` (``validate_simulation_ids`` +
``load_data``) and ``free_convection/src/training_data.jl``
(``FreeConvectionTrainingDataInput`` / ``wrangle_*_training_data``).
"""

from __future__ import annotations

import logging
import os

import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.data.containers import ColumnTimeSeries, coarsen_dataset
from climateparameterizations_jl_tpu.data.registry import FREE_CONVECTION_IDS

logger = logging.getLogger(__name__)

# Surface buoyancy fluxes + initial stratifications spanning the LESbrary
# free-convection suite's range (9 numbered simulations, ``data.jl:3-12``) —
# used by the synthetic stand-ins when the real files are absent.
_SYNTHETIC_PARAMS = {
    1: (1e-8, 2e-3), 2: (2.5e-8, 2e-3), 3: (5e-8, 2e-3),
    4: (7.5e-8, 2e-3), 5: (1e-7, 2e-3), 6: (2.5e-8, 1e-3),
    7: (5e-8, 1e-3), 8: (7.5e-8, 1e-3), 9: (1e-7, 1e-3),
}


def validate_simulation_ids(ids_train, ids_test) -> bool:
    """Warn on overlapping or unused simulation ids (``data.jl:14-30``)."""
    train, test = set(ids_train), set(ids_test)
    ok = True
    overlap = train & test
    if overlap:
        logger.warning("simulations %s appear in both the training and test sets", sorted(overlap))
        ok = False
    unused = set(FREE_CONVECTION_IDS) - train - test
    if unused:
        logger.warning("simulations %s are not used for training or testing", sorted(unused))
        ok = False
    bad = (train | test) - set(FREE_CONVECTION_IDS)
    if bad:
        logger.warning("unknown simulation ids %s (valid: 1..9)", sorted(bad))
        ok = False
    return ok


def save_column_npz(path: str, ds: ColumnTimeSeries) -> None:
    """Atomically dump a :class:`ColumnTimeSeries` to npz (tmp + rename).

    A direct ``np.savez(path)`` interrupted mid-write (kill, OOM, two CLI
    runs sharing a cache dir) leaves a truncated zip that poisons every
    later load; writing to a tmp file in the same directory and
    ``os.replace``-ing keeps readers safe.
    """
    import dataclasses
    import tempfile

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".npz", dir=os.path.dirname(path) or ".")
    try:
        with os.fdopen(fd, "wb") as f:
            # Skip unset optional fields (e.g. diurnal_amplitude=None);
            # load_column_npz restores only the keys present.
            arrays = {
                f_.name: np.asarray(v)
                for f_ in dataclasses.fields(ds)
                if (v := getattr(ds, f_.name)) is not None
            }
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_column_npz(path: str) -> ColumnTimeSeries:
    import dataclasses

    with np.load(path) as z:
        names = {f.name for f in dataclasses.fields(ColumnTimeSeries)}
        return ColumnTimeSeries(**{k: jnp.asarray(z[k]) for k in z.files if k in names})


def load_free_convection_simulation(
    simulation_id: int,
    data_dir: str | None = None,
    Nz: int = 32,
    Nz_les: int = 128,
    n_save: int = 96,
    dt_save: float = 600.0,
    source: str = "auto",
    les_cache_dir: str | None = None,
) -> ColumnTimeSeries:
    """One free-convection simulation, coarse-grained to ``Nz`` levels.

    ``source="auto"``: reads
    ``<data_dir>/free_convection_<id>/instantaneous_statistics_with_halos.jld2``
    when present (the DataDeps layout, ``data.jl:32-71``); otherwise the
    id-specific synthetic stand-in. ``source="les3d"`` GENERATES the data by
    running the 3-D LES with the id's surface buoyancy flux (Qu = 0);
    ``les_cache_dir`` persists the averaged profiles so repeated loads of the
    same (id, resolution, save grid) skip the LES re-run.
    """
    if simulation_id not in FREE_CONVECTION_IDS:
        raise KeyError(f"free-convection simulation id must be in 1..9, got {simulation_id}")
    Qb, strat = _SYNTHETIC_PARAMS[simulation_id]

    if source == "les3d":
        import dataclasses

        import jax

        from climateparameterizations_jl_tpu.data.les import LESConfig, run_les, stable_dt

        cache_path = None
        if les_cache_dir is not None:
            cache_path = os.path.join(
                les_cache_dir,
                f"les3d_sim{simulation_id}_N{Nz_les}_n{n_save}_dt{dt_save:g}.npz",
            )
            if os.path.exists(cache_path):
                try:
                    return coarsen_dataset(load_column_npz(cache_path), Nz)
                except Exception as e:  # corrupt/stale-schema cache: regenerate
                    logger.warning("LES cache %s unreadable (%s); regenerating", cache_path, e)
        config = LESConfig.default(Nx=min(Nz_les, 64), Ny=min(Nz_les, 64), Nz=Nz_les, Qu=0.0, Qb=Qb)
        # Per-id initial/bottom stratification (ids sharing Qb differ only
        # in strat) and a per-id noise seed, so every id is distinct.
        config = dataclasses.replace(config, dTdz=jnp.asarray(strat, config.dTdz.dtype))
        dt = stable_dt(config, cfl=0.6)
        ds = run_les(
            config, dt=dt, n_save=n_save, save_every=max(1, int(round(dt_save / dt))),
            key=jax.random.PRNGKey(simulation_id), method="rk3",
        )
        if cache_path is not None:
            save_column_npz(cache_path, ds)
        return coarsen_dataset(ds, Nz)

    if data_dir is not None:
        path = os.path.join(data_dir, f"free_convection_{simulation_id}", "instantaneous_statistics_with_halos.jld2")
        if os.path.exists(path):
            from climateparameterizations_jl_tpu.data.lesbrary import read_les_profiles

            return coarsen_dataset(read_les_profiles(path), Nz)

    from climateparameterizations_jl_tpu.data.synthetic import synthetic_free_convection_les

    ds = synthetic_free_convection_les(Qb=Qb, Nz=Nz_les, n_save=n_save, dt_save=dt_save, stratification=strat)
    return coarsen_dataset(ds, Nz)


def load_data(ids_train, ids_test, Nz: int = 32, data_dir: str | None = None, **kwargs):
    """Load + partition the suite (``load_data``, ``data.jl:32-71``).

    Returns ``(train: {id: ds}, test: {id: ds})`` of coarse datasets.
    """
    validate_simulation_ids(ids_train, ids_test)
    load = lambda i: load_free_convection_simulation(i, data_dir, Nz, **kwargs)  # noqa: E731
    return {i: load(i) for i in ids_train}, {i: load(i) for i in ids_test}


def build_free_convection_model(
    ds: ColumnTimeSeries,
    T_scaling,
    wT_scaling,
    base_closure: str = "convective_adjustment",
):
    """Constants + scalings + PER-SIM scaled BC fluxes from a dataset.

    The reference builds one NDE per simulation with that simulation's own
    boundary fluxes (``free_convection_nde.jl:49-62`` packs them into each
    problem's parameter tail); here a stacked suite gets ``(S,)`` flux arrays
    that ``pad_faces`` broadcasts LEFT-aligned over the suite axis. Baking
    sim 0's flux into a shared scalar would train every other member against
    the wrong surface forcing (Qb spans 1e-8..1e-7 across the suite,
    ``data.jl:3-12``). ``H``/``tau`` enter the scalar prefactor algebra and
    must agree across members; raises otherwise.
    """
    from climateparameterizations_jl_tpu.models.free_convection import FreeConvectionModel

    H = np.asarray(ds.H).reshape(-1)
    if not np.allclose(H, H[0]):
        raise ValueError(f"free-convection suite members disagree on column depth H: {H}")
    t_rows = np.asarray(ds.t).reshape(-1, ds.t.shape[-1])
    taus = np.abs(t_rows[:, -1] - t_rows[:, 0])
    if not np.allclose(taus, taus[0]):
        raise ValueError(f"free-convection suite members disagree on time span tau: {taus}")
    return FreeConvectionModel(
        H=jnp.asarray(H[0], dtype=ds.T.dtype),
        tau=jnp.asarray(taus[0], dtype=ds.T.dtype),
        T_scaling=T_scaling,
        wT_scaling=wT_scaling,
        bottom_flux=wT_scaling.scale(ds.wT[..., 0, 0]),
        top_flux=wT_scaling.scale(jnp.asarray(ds.theta_top)),
        Nz=ds.Nz,
        base_closure=base_closure,
    )


def free_convection_regression_pairs(ds: ColumnTimeSeries, T_scaling, wT_scaling):
    """Per-snapshot (scaled T profile, scaled wT faces) pairs.

    Parity: ``wrangle_input_training_data`` / ``wrangle_output_training_data``
    (``training_data.jl:15-46``). The targets include the boundary faces —
    the trainer pins predictions to them (they are BCs, not learnable).
    """
    x = T_scaling.scale(ds.T).reshape(-1, ds.T.shape[-1])
    y = wT_scaling.scale(ds.wT).reshape(-1, ds.wT.shape[-1])
    return jnp.asarray(x), jnp.asarray(y)
