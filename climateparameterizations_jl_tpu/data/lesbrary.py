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
    """Numeric iteration keys in time order.

    Oceananigans FieldTimeSeries groups also hold a ``serialized/`` subgroup
    (locations, BCs) next to the iteration datasets — skip anything that
    isn't an iteration number, and sort NUMERICALLY (real files use
    simulation iteration numbers like ``"9000" < "10800"``, which
    lexicographic order would reverse).
    """
    return sorted((k for k in group.keys() if k.lstrip("-").isdigit()), key=int)


def _strip_halo(arr: np.ndarray, Nz: int, halo: int) -> np.ndarray:
    """Strip halos from one profile by its observed length.

    Real wind-mixing statistics files store profiles UNPADDED (``Nz``
    centers / ``Nz + 1`` faces; ``lesbrary_data.jl:98-107`` broadcasts them
    straight into ``Nz``-sized arrays) while free-convection
    ``instantaneous_statistics_with_halos.jld2`` files pad both by ``Hz``
    cells each side. Handle each variable by what it actually is.
    """
    n = arr.size
    if n in (Nz, Nz + 1):
        return arr
    if halo > 0 and n in (Nz + 2 * halo, Nz + 1 + 2 * halo):
        return arr[halo:-halo]
    raise ValueError(f"profile of length {n} does not match Nz={Nz} (halo {halo})")


def _profile_series(f, name: str, Nz: int, halo: int) -> np.ndarray:
    """Stack ``timeseries/<name>/<iter>`` into ``(Nt, Nz[+1])``, halos stripped."""
    g = f["timeseries"][name]
    frames = []
    for it in _iterations(g):
        # Julia writes (1, 1, N); h5py sees the dims reversed as (N, 1, 1).
        arr = np.asarray(g[it]).reshape(-1)
        frames.append(_strip_halo(arr, Nz, halo))
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
    """Read a LESbrary ``.jld2`` file into a :class:`ColumnTimeSeries`.

    Handles BOTH real layouts (see module docstring): ``Nz`` is derived
    from the halo-padded grid, ``Nz = len(grid/zC) - 2*halo``
    (``lesbrary_data.jl:65``, the grid arrays carry 3 ghost cells each
    side), with the halo width taken from ``grid/Hz`` when the file stores
    it (Oceananigans FieldDataset files do). Profiles are stripped per
    variable by observed length, since statistics files store them
    unpadded while ``*_with_halos`` files pad them.
    """
    if not HAVE_H5PY:
        raise RuntimeError("h5py is required to read .jld2 LES files")
    with h5py.File(path, "r") as f:
        if "grid" in f and "Hz" in f["grid"]:
            halo = int(np.asarray(f["grid"]["Hz"])[()])
        zc = np.asarray(f["grid"]["zC"]).reshape(-1) if "grid" in f and "zC" in f["grid"] else None

        tgroup = f["timeseries"]["t"]
        t = np.asarray([np.asarray(tgroup[it])[()] for it in _iterations(tgroup)], dtype)

        # Probe the first T frame against the grid to fix Nz for this file.
        tg = f["timeseries"]["T"]
        n_probe = int(np.asarray(tg[_iterations(tg)[0]]).size)
        if zc is None:
            Nz = n_probe
        elif n_probe == zc.size - 2 * halo:  # statistics layout: profiles unpadded
            Nz = n_probe
        elif n_probe == zc.size:  # *_with_halos layout: both padded
            Nz = zc.size - 2 * halo
        elif n_probe == zc.size + 2 * halo:  # legacy round-trip files (grid unpadded)
            Nz = zc.size
        else:
            raise ValueError(f"cannot reconcile T profile length {n_probe} with grid zC length {zc.size} (halo {halo})")

        T = _profile_series(f, "T", Nz, halo).astype(dtype)
        u = _profile_series(f, "u", Nz, halo).astype(dtype) if "u" in f["timeseries"] else np.zeros_like(T)
        v = _profile_series(f, "v", Nz, halo).astype(dtype) if "v" in f["timeseries"] else np.zeros_like(T)

        zeros_f = np.zeros((T.shape[0], Nz + 1), dtype)
        wT = _profile_series(f, "wT", Nz, halo).astype(dtype) if "wT" in f["timeseries"] else zeros_f
        wu = _profile_series(f, "wu", Nz, halo).astype(dtype) if "wu" in f["timeseries"] else zeros_f
        wv = _profile_series(f, "wv", Nz, halo).astype(dtype) if "wv" in f["timeseries"] else zeros_f

        # Free-convection FieldDataset files carry only T/wT and a surface
        # flux; every wind-mixing-specific key gets a physical default so
        # both layouts read (module docstring).
        alpha = _first(f, ["buoyancy/model/equation_of_state/α", "buoyancy/equation_of_state/α"], 2e-4)
        beta = _first(f, ["buoyancy/model/equation_of_state/β", "buoyancy/equation_of_state/β"], 0.0)
        g = _first(f, ["buoyancy/model/gravitational_acceleration", "buoyancy/gravitational_acceleration"], 9.80665)
        f_cor = _first(f, ["coriolis/f"], 0.0)
        L = _first(f, ["grid/Lz"])

        # Free-convection FieldDataset files record the temperature flux
        # directly (``add_surface_fluxes!`` reads parameters/temperature_flux,
        # add_surface_fluxes.jl:2) — prefer it; wind-mixing statistics files
        # record a buoyancy flux to divide by alpha*g (lesbrary_data.jl:164-165).
        theta_top = _first(
            f,
            ["parameters/temperature_flux", "parameters/surface_temperature_flux", "parameters/Qθ"],
            None,
        )
        if theta_top is None:
            buoyancy_flux = _first(
                f,
                ["parameters/buoyancy_flux", "parameters/surface_buoyancy_flux", "parameters/Qb"],
                None,
            )
            if buoyancy_flux is not None:
                theta_top = buoyancy_flux / alpha / g
            else:
                theta_top = float(wT[0, -1]) if wT.size else 0.0
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


def _halo_grid(H: float, Nz: int, halo: int):
    """Face/center coordinates WITH ``halo`` ghost cells each side, the way
    Oceananigans stores ``grid/zC`` / ``grid/zF`` (``lesbrary_data.jl:156-157``
    strips ``[4:end-3]``)."""
    dz = H / Nz
    zf = -H + dz * np.arange(-halo, Nz + halo + 1)  # Nz + 1 + 2*halo faces
    zc = 0.5 * (zf[:-1] + zf[1:])  # Nz + 2*halo centers
    return zc, zf


def write_les_profiles(path: str, ds: ColumnTimeSeries, halo: int = 3, iteration_stride: int = 1):
    """Write a :class:`ColumnTimeSeries` in the real LESbrary statistics layout.

    Byte-layout parity with the files ``ReadJLD2_LESbraryData`` consumes
    (``lesbrary_data.jl:56-190``):

    - ``timeseries/<var>/<iteration>`` datasets are UNPADDED profiles
      (``Nz`` centers / ``Nz + 1`` faces) stored with Julia's ``(1, 1, N)``
      axis order — h5py sees ``(N, 1, 1)``;
    - ``timeseries/t/<iteration>`` scalars keyed by simulation iteration
      number (stride-able, exercising numeric key order);
    - ``grid/{zC, zF}`` carry ``halo`` ghost cells on EACH side
      (``Nz = len(zC) - 6``); ``grid/Lz`` is the depth;
    - ``buoyancy/model/...``, ``coriolis/f``, and the four
      ``parameters/*`` BC entries, with the surface temperature flux
      recorded as a BUOYANCY flux (``theta_top = buoyancy_flux / (alpha g)``,
      ``lesbrary_data.jl:164-165``).

    Lets the 3-D LES generator (``data/les.py``) emit reference-compatible
    ``.jld2`` files so a generated dataset can feed any ``--data-dir``
    pipeline (or the original Julia code).
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
                key = str(i * iteration_stride)
                if name == "t":
                    g[key] = arr[i]
                else:
                    g[key] = series[name][i].reshape(-1, 1, 1)
        H = float(ds.H)
        Nz = ds.T.shape[-1]
        zc, zf = _halo_grid(H, Nz, halo)
        f["grid/Lz"] = H
        f["grid/zC"] = zc
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


def write_fc_fieldset(path: str, ds: ColumnTimeSeries, halo: int = 3, iteration_stride: int = 1):
    """Write the free-convection ``instantaneous_statistics_with_halos.jld2``
    FieldDataset layout (``free_convection/src/data.jl:32-71``).

    Differences from the statistics layout that :func:`read_les_profiles`
    must survive:

    - profiles are stored WITH ``Hz`` halo cells each side (the file name
      says so); faces get ``Nz + 1 + 2*Hz`` entries;
    - each ``timeseries/<var>/`` group carries a ``serialized/`` subgroup
      (field locations / boundary conditions) that is NOT an iteration;
    - the grid group stores the struct fields ``Nz``/``Hz``/``Lz`` plus the
      halo-padded coordinates;
    - the surface flux lives at ``parameters/temperature_flux`` (read by
      ``add_surface_fluxes!``, ``free_convection/src/add_surface_fluxes.jl:2``).
    """
    if not HAVE_H5PY:
        raise RuntimeError("h5py is required to write .jld2 LES files")
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    t = np.asarray(ds.t, np.float64)
    Nz = ds.T.shape[-1]

    def pad(row):
        return np.concatenate([np.zeros(halo, row.dtype), row, np.zeros(halo, row.dtype)])

    with h5py.File(path, "w") as f:
        for name in ("t", "T", "wT"):
            g = f.create_group(f"timeseries/{name}")
            if name != "t":
                s = g.create_group("serialized")
                s["location"] = np.bytes_(b"(Center, Center, " + (b"Face)" if name == "wT" else b"Center)"))
            for i in range(t.shape[0]):
                key = str(i * iteration_stride)
                if name == "t":
                    g[key] = t[i]
                else:
                    arr = np.asarray(getattr(ds, name))[i]
                    g[key] = pad(arr).reshape(-1, 1, 1)
        H = float(ds.H)
        zc, zf = _halo_grid(H, Nz, halo)
        f["grid/Nz"] = Nz
        f["grid/Hz"] = halo
        f["grid/Lz"] = H
        f["grid/zC"] = zc
        f["grid/zF"] = zf
        f["parameters/temperature_flux"] = float(ds.theta_top)
        f["parameters/buoyancy_flux"] = float(ds.theta_top) * float(ds.alpha) * float(ds.g)
        f["parameters/boundary_condition_θ_bottom"] = float(ds.theta_bottom)
    return path
