"""LESbrary ``.jld2`` readers (JLD2 files are HDF5 — read with h5py).

Two on-disk layouts, mirroring the reference's two loaders:

- **wind_mixing statistics files** (``wind_mixing/src/lesbrary_data.jl:56-190``):
  ``timeseries/<var>/<iteration>`` groups holding ``(1, 1, Nz + 2*halo)``
  horizontally-averaged profiles with a halo of 3 on each side
  (``lesbrary_data.jl:156-157``), plus ``grid/{zC,zF,Lz}``,
  ``buoyancy[/model]/equation_of_state/{α,β}`` + gravity, ``coriolis/f``, and
  ``parameters/{buoyancy_flux, boundary_condition_u_top,
  boundary_condition_θ_bottom, boundary_condition_u_bottom}``. The surface
  temperature flux is derived as ``buoyancy_flux / (α g)``
  (``lesbrary_data.jl:164-165``).

- **free_convection FieldDataset files**
  (``free_convection/src/data.jl:32-71``): same ``timeseries`` idea with
  ``T`` and ``wT`` only; surface flux in ``parameters``.

The reader returns a time-major :class:`ColumnTimeSeries` ready for
``coarsen_dataset`` + scaling.
"""

from __future__ import annotations

import numpy as np

from climateparameterizations_jl_tpu.data.containers import ColumnTimeSeries

try:
    import h5py

    HAVE_H5PY = True
except ImportError:  # pragma: no cover
    HAVE_H5PY = False


def _iterations(group) -> list[str]:
    return sorted(group.keys(), key=lambda k: int(k))


def _profile_series(f, name: str, halo: int) -> np.ndarray:
    """Stack ``timeseries/<name>/<iter>`` into ``(Nt, Nz)``, stripping halos."""
    g = f["timeseries"][name]
    frames = []
    for it in _iterations(g):
        arr = np.asarray(g[it])
        arr = arr.reshape(-1)  # stored as (1, 1, N) or (N,)
        if halo > 0:
            arr = arr[halo:-halo]
        frames.append(arr)
    return np.stack(frames, axis=0)


_MISSING = object()


def _first(f, paths, default=_MISSING):
    for p in paths:
        try:
            node = f
            for part in p.split("/"):
                node = node[part]
            return np.asarray(node)[()]
        except KeyError:
            continue
    if default is not _MISSING:
        return default
    raise KeyError(f"none of {paths} found in file")


def read_les_profiles(path: str, halo: int = 3, dtype=np.float32) -> ColumnTimeSeries:
    """Read a wind-mixing LESbrary statistics file into a :class:`ColumnTimeSeries`."""
    if not HAVE_H5PY:
        raise RuntimeError("h5py is required to read .jld2 LES files")
    with h5py.File(path, "r") as f:
        tgroup = f["timeseries"]["t"]
        t = np.asarray([np.asarray(tgroup[it])[()] for it in _iterations(tgroup)], dtype)

        T = _profile_series(f, "T", halo).astype(dtype)
        u = _profile_series(f, "u", halo).astype(dtype) if "u" in f["timeseries"] else np.zeros_like(T)
        v = _profile_series(f, "v", halo).astype(dtype) if "v" in f["timeseries"] else np.zeros_like(T)

        Nz = T.shape[1]
        zeros_f = np.zeros((T.shape[0], Nz + 1), dtype)
        wT = _profile_series(f, "wT", halo).astype(dtype) if "wT" in f["timeseries"] else zeros_f
        wu = _profile_series(f, "wu", halo).astype(dtype) if "wu" in f["timeseries"] else zeros_f
        wv = _profile_series(f, "wv", halo).astype(dtype) if "wv" in f["timeseries"] else zeros_f

        # Free-convection FieldDataset files carry only T/wT and a surface
        # flux; every wind-mixing-specific key gets a physical default so
        # both layouts read (module docstring).
        alpha = _first(f, ["buoyancy/model/equation_of_state/α", "buoyancy/equation_of_state/α"], 2e-4)
        beta = _first(f, ["buoyancy/model/equation_of_state/β", "buoyancy/equation_of_state/β"], 0.0)
        g = _first(f, ["buoyancy/model/gravitational_acceleration", "buoyancy/gravitational_acceleration"], 9.80665)
        f_cor = _first(f, ["coriolis/f"], 0.0)
        L = _first(f, ["grid/Lz"])

        buoyancy_flux = _first(
            f,
            ["parameters/buoyancy_flux", "parameters/surface_buoyancy_flux", "parameters/Qb"],
            None,
        )
        if buoyancy_flux is not None:
            theta_top = buoyancy_flux / alpha / g
        else:
            theta_top = _first(
                f,
                ["parameters/temperature_flux", "parameters/surface_temperature_flux", "parameters/Qθ"],
                float(wT[0, -1]) if wT.size else 0.0,
            )
        u_top = _first(f, ["parameters/boundary_condition_u_top", "parameters/momentum_flux", "parameters/Qu"], 0.0)
        theta_bottom = _first(
            f,
            ["parameters/boundary_condition_θ_bottom", "parameters/boundary_condition_theta_bottom",
             "parameters/temperature_gradient", "parameters/dθdz_deep"],
            0.0,
        )

    import jax.numpy as jnp

    a = lambda x: jnp.asarray(np.asarray(x, dtype))  # noqa: E731
    return ColumnTimeSeries(
        u=a(u), v=a(v), T=a(T), uw=a(wu), vw=a(wv), wT=a(wT), t=a(t),
        H=a(L), f=a(f_cor), g=a(g), alpha=a(alpha), beta=a(beta),
        u_top=a(u_top), theta_top=a(theta_top), theta_bottom=a(theta_bottom),
    )


def write_les_profiles(path: str, ds: ColumnTimeSeries, halo: int = 3):
    """Write a :class:`ColumnTimeSeries` in the LESbrary statistics layout.

    Inverse of :func:`read_les_profiles`: ``timeseries/<var>/<iteration>``
    profile groups with ``halo`` zero cells on each side, grid/buoyancy/
    coriolis/parameters metadata. Lets the 3-D LES generator
    (``data/les.py``) emit reference-compatible ``.jld2`` files so a
    generated dataset can feed any ``--data-dir`` pipeline (or the original
    Julia code).
    """
    if not HAVE_H5PY:
        raise RuntimeError("h5py is required to write .jld2 LES files")
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    t = np.asarray(ds.t, np.float64)
    series = {
        "t": t,
        "u": np.asarray(ds.u), "v": np.asarray(ds.v), "T": np.asarray(ds.T),
        "wu": np.asarray(ds.uw), "wv": np.asarray(ds.vw), "wT": np.asarray(ds.wT),
    }
    with h5py.File(path, "w") as f:
        for name, arr in series.items():
            g = f.create_group(f"timeseries/{name}")
            for i in range(t.shape[0]):
                if name == "t":
                    g[str(i)] = arr[i]
                else:
                    row = arr[i]
                    padded = np.concatenate([np.zeros(halo, row.dtype), row, np.zeros(halo, row.dtype)])
                    g[str(i)] = padded.reshape(1, 1, -1)
        H = float(ds.H)
        Nz = ds.T.shape[-1]
        zf = np.linspace(-H, 0.0, Nz + 1)
        f["grid/Lz"] = H
        f["grid/zC"] = 0.5 * (zf[:-1] + zf[1:])
        f["grid/zF"] = zf
        f["buoyancy/model/equation_of_state/α"] = float(ds.alpha)
        f["buoyancy/model/equation_of_state/β"] = float(ds.beta)
        f["buoyancy/model/gravitational_acceleration"] = float(ds.g)
        f["coriolis/f"] = float(ds.f)
        f["parameters/buoyancy_flux"] = float(ds.theta_top) * float(ds.alpha) * float(ds.g)
        f["parameters/boundary_condition_u_top"] = float(ds.u_top)
        f["parameters/boundary_condition_u_bottom"] = 0.0
        f["parameters/boundary_condition_θ_bottom"] = float(ds.theta_bottom)
    return path
