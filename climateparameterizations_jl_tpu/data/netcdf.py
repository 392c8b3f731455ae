"""Minimal netCDF-4 writer/reader on h5py (no netCDF library needed).

The reference's host-model embedding writes its paired simulations with
Oceananigans' ``NetCDFOutputWriter`` (``free_convection/src/oceananigans_nn.jl:167-210``:
``oceananigans_convective_adjustment.nc`` with ``T`` and
``oceananigans_neural_network.nc`` with ``T`` and ``wT`` on the ``zF`` faces)
and reads them back with NCDatasets. netCDF-4 *is* HDF5 with the dimension-
scale convention, so this module produces files any netCDF-4 tool
(netcdf-c, xarray, ncdump) opens, using only h5py:

- every dimension is a 1-D *dimension scale* dataset
  (``CLASS = "DIMENSION_SCALE"``), holding the coordinate values;
- every variable attaches the scales of its dimensions (which records the
  HDF5 ``DIMENSION_LIST`` / ``REFERENCE_LIST`` attributes netCDF walks);
- the root ``_NCProperties`` attribute marks the file as netCDF-4.

Scope: flat (root-group) classic-model files — exactly what the reference
writes. Compression/unlimited dimensions are out of scope.
"""

from __future__ import annotations

import numpy as np

_NC_PROPERTIES = "version=2,climateparameterizations_jl_tpu=1,h5py=?"


def write_netcdf(path, variables: dict, coords: dict, attrs: dict | None = None) -> None:
    """Write a netCDF-4 (HDF5 + dimension scales) file.

    Args:
      path: output filename (conventionally ``.nc``).
      variables: ``{name: (dims, array)}`` where ``dims`` is a tuple of
        dimension names matching ``array.ndim``.
      coords: ``{dim_name: 1-D coordinate array}``; every dimension used by
        a variable must appear here.
      attrs: optional global (root) attributes.
    """
    import h5py

    for name, (dims, arr) in variables.items():
        arr = np.asarray(arr)
        if len(dims) != arr.ndim:
            raise ValueError(f"variable {name!r}: {len(dims)} dims for {arr.ndim}-D data")
        for d, n in zip(dims, arr.shape):
            if d not in coords:
                raise ValueError(f"variable {name!r}: dimension {d!r} missing from coords")
            if len(np.asarray(coords[d])) != n:
                raise ValueError(f"variable {name!r}: dim {d!r} is {len(np.asarray(coords[d]))}, data has {n}")

    with h5py.File(path, "w") as f:
        f.attrs["_NCProperties"] = np.bytes_(_NC_PROPERTIES)
        scales = {}
        for dim, values in coords.items():
            ds = f.create_dataset(dim, data=np.asarray(values))
            ds.make_scale(dim)
            scales[dim] = ds
        for name, (dims, arr) in variables.items():
            var = f.create_dataset(name, data=np.asarray(arr))
            var.attrs["_dims"] = np.array([d.encode() for d in dims])
            for i, d in enumerate(dims):
                var.dims[i].attach_scale(scales[d])
        for key, value in (attrs or {}).items():
            f.attrs[key] = value


def read_netcdf(path):
    """Read a file written by :func:`write_netcdf` (or any flat netCDF-4 file).

    Returns ``(variables, coords, attrs)`` with ``variables`` as
    ``{name: (dims, np.ndarray)}`` and ``coords`` as ``{dim: np.ndarray}``.
    """
    import h5py

    variables, coords, attrs = {}, {}, {}
    with h5py.File(path, "r") as f:
        for key, value in f.attrs.items():
            if key != "_NCProperties":
                attrs[key] = value
        for name, ds in f.items():
            if ds.attrs.get("CLASS") == b"DIMENSION_SCALE":
                coords[name] = np.asarray(ds)
                continue
            if "_dims" in ds.attrs:
                dims = tuple(d.decode() for d in ds.attrs["_dims"])
            else:  # fall back to the attached dimension-scale names
                dims = tuple(
                    (dim[0].name.lstrip("/") if len(dim) else f"dim_{i}")
                    for i, dim in enumerate(ds.dims)
                )
            variables[name] = (dims, np.asarray(ds))
    return variables, coords, attrs


def write_paired_column_netcdf(output_dir, zc, zf, t, T_baseline, T_nn, wT_nn, attrs: dict | None = None):
    """Write the reference's two embedded-simulation output files.

    Parity: ``oceananigans_nn.jl:174-192`` — the baseline (convective
    adjustment only) file holds ``T(time, zC)``; the ``+NN`` file holds
    ``T(time, zC)`` and the NN heat flux ``wT(time, zF)``. Returns the two
    paths.
    """
    import os

    t = np.asarray(t)
    base = {"T": (("time", "zC"), np.asarray(T_baseline))}
    nn = {"T": (("time", "zC"), np.asarray(T_nn)), "wT": (("time", "zF"), np.asarray(wT_nn))}
    coords_c = {"time": t, "zC": np.asarray(zc)}
    coords_f = {"time": t, "zC": np.asarray(zc), "zF": np.asarray(zf)}
    path_ca = os.path.join(output_dir, "oceananigans_convective_adjustment.nc")
    path_nn = os.path.join(output_dir, "oceananigans_neural_network.nc")
    write_netcdf(path_ca, base, coords_c, attrs)
    write_netcdf(path_nn, nn, coords_f, attrs)
    return path_ca, path_nn
