"""Byte-faithful fixtures of the reference's two real .jld2 layouts.

The fixtures below are built with RAW h5py calls transcribed directly from
the reference readers — NOT via this repo's writers — so they pin what the
real files look like on disk:

- wind-mixing statistics layout: ``wind_mixing/src/lesbrary_data.jl:56-190``
  (unpadded profiles in Julia ``(1, 1, N)`` axis order, halo-padded grid
  coordinates with ``Nz = len(zC) - 6``, buoyancy-flux -> theta_top
  derivation at ``lesbrary_data.jl:164-165``, both buoyancy-group variants,
  string iteration keys that only sort correctly as integers);
- free-convection FieldDataset layout: ``free_convection/src/data.jl:32-71``
  (``instantaneous_statistics_with_halos.jld2``: profiles WITH halos,
  ``serialized/`` subgroups inside each timeseries group,
  ``parameters/temperature_flux`` read by ``add_surface_fluxes!``).

``read_les_profiles`` must parse both bit-for-bit.
"""

import numpy as np
import pytest

from climateparameterizations_jl_tpu.data.lesbrary import HAVE_H5PY, read_les_profiles

if HAVE_H5PY:
    import h5py

pytestmark = pytest.mark.skipif(not HAVE_H5PY, reason="h5py not available")

HALO = 3


def _grid_with_halos(H, Nz):
    dz = H / Nz
    zf = -H + dz * np.arange(-HALO, Nz + HALO + 1)
    zc = 0.5 * (zf[:-1] + zf[1:])
    return zc, zf


def _julia_profile(row):
    """A Julia ``(1, 1, N)`` array as h5py sees it: dims reversed."""
    return np.asarray(row, np.float64).reshape(-1, 1, 1)


# Iteration keys chosen so LEXICOGRAPHIC order is wrong: sorted() gives
# ["0", "10800", "5400", "9000"]; only int-keyed sorting is correct.
ITERS = ["0", "5400", "9000", "10800"]


def make_windmixing_statistics_fixture(path, variant="model", Nz=16, seed=0):
    """Transcription of the file ``ReadJLD2_LESbraryData`` reads."""
    rng = np.random.default_rng(seed)
    Nt = len(ITERS)
    H, alpha, beta, g, f_cor = 256.0, 2e-4, 0.0, 9.80665, 1e-4
    buoyancy_flux, u_top, theta_bottom, u_bottom = 5.88e-8, -5e-4, 0.01, 0.0
    data = {
        "T": rng.normal(20.0, 1.0, (Nt, Nz)),
        "u": rng.normal(0.0, 0.01, (Nt, Nz)),
        "v": rng.normal(0.0, 0.01, (Nt, Nz)),
        "wT": rng.normal(0.0, 1e-5, (Nt, Nz + 1)),
        "wu": rng.normal(0.0, 1e-4, (Nt, Nz + 1)),
        "wv": rng.normal(0.0, 1e-4, (Nt, Nz + 1)),
    }
    t = np.arange(Nt) * 600.0
    zc, zf = _grid_with_halos(H, Nz)
    with h5py.File(path, "w") as fh:
        for j, key in enumerate(ITERS):
            fh[f"timeseries/t/{key}"] = t[j]
            for var, arr in data.items():
                fh[f"timeseries/{var}/{key}"] = _julia_profile(arr[j])
        fh["grid/Lz"] = H
        fh["grid/zC"] = zc  # Nz + 6 entries: reader must do len - 6
        fh["grid/zF"] = zf  # Nz + 7 entries
        prefix = "buoyancy/model" if variant == "model" else "buoyancy"
        fh[f"{prefix}/equation_of_state/α"] = alpha
        fh[f"{prefix}/equation_of_state/β"] = beta
        fh[f"{prefix}/gravitational_acceleration"] = g
        fh["coriolis/f"] = f_cor
        fh["parameters/buoyancy_flux"] = buoyancy_flux
        fh["parameters/boundary_condition_u_top"] = u_top
        fh["parameters/boundary_condition_θ_bottom"] = theta_bottom
        fh["parameters/boundary_condition_u_bottom"] = u_bottom
    expect = dict(data=data, t=t, H=H, alpha=alpha, g=g, f=f_cor,
                  theta_top=buoyancy_flux / alpha / g, u_top=u_top, theta_bottom=theta_bottom)
    return expect


def make_fc_fieldset_fixture(path, Nz=16, seed=1):
    """Transcription of ``instantaneous_statistics_with_halos.jld2``."""
    rng = np.random.default_rng(seed)
    Nt = len(ITERS)
    H, temperature_flux, theta_bottom = 256.0, 3e-5, 2e-3
    T = rng.normal(20.0, 1.0, (Nt, Nz))
    wT = rng.normal(0.0, 1e-5, (Nt, Nz + 1))
    t = np.arange(Nt) * 600.0
    zc, zf = _grid_with_halos(H, Nz)
    # Halo cells filled with a poison value: silent non-stripping would
    # leak 999s into the tensors and fail loudly.
    pad = lambda row: np.concatenate([np.full(HALO, 999.0), row, np.full(HALO, 999.0)])  # noqa: E731
    with h5py.File(path, "w") as fh:
        for j, key in enumerate(ITERS):
            fh[f"timeseries/t/{key}"] = t[j]
            fh[f"timeseries/T/{key}"] = _julia_profile(pad(T[j]))
            fh[f"timeseries/wT/{key}"] = _julia_profile(pad(wT[j]))
        # FieldTimeSeries groups carry non-iteration subgroups the reader
        # must skip.
        fh["timeseries/T/serialized/location"] = np.bytes_(b"(Center, Center, Center)")
        fh["timeseries/wT/serialized/location"] = np.bytes_(b"(Center, Center, Face)")
        fh["grid/Nz"] = Nz
        fh["grid/Hz"] = HALO
        fh["grid/Lz"] = H
        fh["grid/zC"] = zc
        fh["grid/zF"] = zf
        fh["parameters/temperature_flux"] = temperature_flux
        fh["parameters/boundary_condition_θ_bottom"] = theta_bottom
    return dict(T=T, wT=wT, t=t, H=H, theta_top=temperature_flux, theta_bottom=theta_bottom)


class TestWindMixingStatisticsLayout:
    @pytest.mark.parametrize("variant", ["model", "flat"])
    def test_parses_bit_for_bit(self, tmp_path, variant):
        path = str(tmp_path / f"stats_{variant}.jld2")
        expect = make_windmixing_statistics_fixture(path, variant)
        ds = read_les_profiles(path)
        # f32 cast of the stored f64 values is the reader's declared dtype;
        # compare against the same cast (bit-for-bit at f32).
        for ours, theirs in [("T", "T"), ("u", "u"), ("v", "v"), ("wT", "wT"), ("uw", "wu"), ("vw", "wv")]:
            np.testing.assert_array_equal(
                np.asarray(getattr(ds, ours)), expect["data"][theirs].astype(np.float32), err_msg=ours
            )
        np.testing.assert_array_equal(np.asarray(ds.t), expect["t"].astype(np.float32))
        assert float(ds.H) == np.float32(expect["H"])
        assert float(ds.f) == np.float32(expect["f"])
        assert float(ds.alpha) == np.float32(expect["alpha"])
        assert float(ds.u_top) == np.float32(expect["u_top"])
        assert float(ds.theta_bottom) == np.float32(expect["theta_bottom"])
        # theta_top derived from the buoyancy flux (lesbrary_data.jl:164-165)
        assert float(ds.theta_top) == pytest.approx(expect["theta_top"], rel=1e-6)

    def test_iteration_keys_sort_numerically(self, tmp_path):
        path = str(tmp_path / "stats.jld2")
        expect = make_windmixing_statistics_fixture(path)
        ds = read_les_profiles(path)
        t = np.asarray(ds.t)
        assert np.all(np.diff(t) > 0), "iterations read out of order (lexicographic keys?)"
        np.testing.assert_array_equal(t, expect["t"].astype(np.float32))


class TestFreeConvectionFieldsetLayout:
    def test_parses_with_halos_and_serialized_groups(self, tmp_path):
        path = str(tmp_path / "instantaneous_statistics_with_halos.jld2")
        expect = make_fc_fieldset_fixture(path)
        ds = read_les_profiles(path)
        np.testing.assert_array_equal(np.asarray(ds.T), expect["T"].astype(np.float32))
        np.testing.assert_array_equal(np.asarray(ds.wT), expect["wT"].astype(np.float32))
        assert not np.any(np.asarray(ds.T) == np.float32(999.0)), "halo cells leaked into T"
        # Direct temperature flux preferred (add_surface_fluxes.jl:2).
        assert float(ds.theta_top) == np.float32(expect["theta_top"])
        assert float(ds.theta_bottom) == np.float32(expect["theta_bottom"])
        # FC files carry no velocities: zeros, FC semantics.
        assert np.all(np.asarray(ds.u) == 0.0) and np.all(np.asarray(ds.v) == 0.0)

    def test_fc_loader_end_to_end(self, tmp_path):
        """load_free_convection_simulation reads a DataDeps-layout file."""
        from climateparameterizations_jl_tpu.data.free_convection import load_free_convection_simulation

        d = tmp_path / "free_convection_3"
        d.mkdir()
        expect = make_fc_fieldset_fixture(str(d / "instantaneous_statistics_with_halos.jld2"))
        ds = load_free_convection_simulation(3, data_dir=str(tmp_path), Nz=8)
        assert ds.T.shape == (len(ITERS), 8)
        # Block-mean coarse-graining preserves the column mean per frame.
        np.testing.assert_allclose(
            np.asarray(ds.T).mean(axis=-1), expect["T"].astype(np.float32).mean(axis=-1), rtol=1e-6
        )


class TestWritersEmitRealLayouts:
    """Our writers produce files structurally identical to the fixtures."""

    def _synthetic(self, Nz=12):
        from climateparameterizations_jl_tpu.data.synthetic import synthetic_wind_mixing_les

        return synthetic_wind_mixing_les(Qu=-5e-4, Qb=3e-8, Nz=Nz, n_save=3, dt_save=600.0, n_substeps=2)

    def test_statistics_writer_layout(self, tmp_path):
        from climateparameterizations_jl_tpu.data.lesbrary import write_les_profiles

        ds = self._synthetic(Nz=12)
        path = str(tmp_path / "out.jld2")
        write_les_profiles(path, ds, iteration_stride=600)
        with h5py.File(path, "r") as fh:
            Nz = 12
            assert fh["grid/zC"].shape[0] == Nz + 2 * HALO  # halo-padded grid
            assert fh["grid/zF"].shape[0] == Nz + 1 + 2 * HALO
            # profiles UNPADDED, Julia axis order
            assert fh["timeseries/T/0"].shape == (Nz, 1, 1)
            assert fh["timeseries/wT/600"].shape == (Nz + 1, 1, 1)
            assert "parameters/buoyancy_flux" in fh
        back = read_les_profiles(path)
        np.testing.assert_allclose(np.asarray(back.T), np.asarray(ds.T), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back.wT), np.asarray(ds.wT), rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(float(back.theta_top), float(ds.theta_top), rtol=1e-5)

    def test_fc_writer_layout(self, tmp_path):
        from climateparameterizations_jl_tpu.data.lesbrary import write_fc_fieldset
        from climateparameterizations_jl_tpu.data.synthetic import synthetic_free_convection_les

        ds = synthetic_free_convection_les(Qb=5e-8, Nz=16, n_save=3, dt_save=600.0)
        path = str(tmp_path / "instantaneous_statistics_with_halos.jld2")
        write_fc_fieldset(path, ds)
        with h5py.File(path, "r") as fh:
            assert fh["timeseries/T/0"].shape == (16 + 2 * HALO, 1, 1)  # WITH halos
            assert "timeseries/T/serialized" in fh
            assert int(np.asarray(fh["grid/Hz"])[()]) == HALO
            assert "parameters/temperature_flux" in fh
        back = read_les_profiles(path)
        np.testing.assert_allclose(np.asarray(back.T), np.asarray(ds.T), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back.wT), np.asarray(ds.wT), rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(float(back.theta_top), float(ds.theta_top), rtol=1e-5)


class TestFetch:
    def test_fetch_downloads_and_loads(self, tmp_path, monkeypatch):
        """fetch_free_convection streams a (mock) URL into the DataDeps layout
        and the FC loader consumes the result."""
        import io
        import urllib.request

        from climateparameterizations_jl_tpu.data.free_convection import load_free_convection_simulation
        from climateparameterizations_jl_tpu.data.registry import fetch_free_convection

        src = tmp_path / "served.jld2"
        make_fc_fieldset_fixture(str(src))
        payload = src.read_bytes()

        class FakeResponse(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        def fake_urlopen(url, timeout=None):
            assert "free_convection_2" in url and url.endswith("instantaneous_statistics_with_halos.jld2")
            return FakeResponse(payload)

        monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
        data_dir = str(tmp_path / "data")
        dest = fetch_free_convection(2, data_dir)
        assert dest.endswith("free_convection_2/instantaneous_statistics_with_halos.jld2")
        ds = load_free_convection_simulation(2, data_dir=data_dir, Nz=8)
        assert ds.T.shape == (len(ITERS), 8)
        # Second call is a no-op cache hit (no network): poison urlopen.
        monkeypatch.setattr(urllib.request, "urlopen", lambda *a, **k: (_ for _ in ()).throw(AssertionError("refetched")))
        assert fetch_free_convection(2, data_dir) == dest

    def test_fetch_offline_is_graceful(self, tmp_path, monkeypatch):
        import urllib.error
        import urllib.request

        from climateparameterizations_jl_tpu.data.registry import fetch_free_convection

        def offline(url, timeout=None):
            raise urllib.error.URLError("no route to host")

        monkeypatch.setattr(urllib.request, "urlopen", offline)
        with pytest.raises(ConnectionError, match="synthetic"):
            fetch_free_convection(1, str(tmp_path))
        # No half-written file left behind.
        assert not (tmp_path / "free_convection_1" / "instantaneous_statistics_with_halos.jld2").exists()

    def test_cli_fetch_offline(self, tmp_path, monkeypatch, capsys):
        import urllib.error
        import urllib.request

        from climateparameterizations_jl_tpu.cli import main

        monkeypatch.setattr(
            urllib.request, "urlopen",
            lambda url, timeout=None: (_ for _ in ()).throw(urllib.error.URLError("offline")),
        )
        rc = main(["fetch", "--sim-ids", "1,2", "--data-dir", str(tmp_path)])
        out = capsys.readouterr().out
        assert rc == 1
        assert "FAILED" in out and "2/2" in out
