"""Scalar variance-inflation calibration of Gaussian UQ bands."""

import numpy as np
import pytest

from climateparameterizations_jl_tpu.eval.uq_calibration import (
    BandCalibration,
    band_report,
    coverage,
    fit_band_calibration,
    fit_inflation_coverage,
    fit_inflation_nll,
    spread_skill,
    standardized_errors,
)


def _gaussian_bands(rng, n=20000, understate=2.0):
    """Truth drawn from N(mean, sigma_true) with the PREDICTED std
    understated by ``understate`` (the deep-ensemble failure mode)."""
    mean = rng.normal(size=n)
    std_pred = 0.1 + rng.uniform(size=n)
    std_true = understate * std_pred
    truth = mean + std_true * rng.standard_normal(n)
    return truth, mean, std_pred


class TestFitting:
    def test_nll_recovers_understatement(self):
        rng = np.random.default_rng(0)
        truth, mean, std = _gaussian_bands(rng, understate=2.0)
        lam = fit_inflation_nll(standardized_errors(truth, mean, std))
        assert 1.9 < lam < 2.1

    def test_coverage_fit_recovers_understatement(self):
        rng = np.random.default_rng(1)
        truth, mean, std = _gaussian_bands(rng, understate=2.0)
        lam = fit_inflation_coverage(standardized_errors(truth, mean, std))
        assert 1.85 < lam < 2.15

    def test_well_calibrated_needs_no_inflation(self):
        rng = np.random.default_rng(2)
        truth, mean, std = _gaussian_bands(rng, understate=1.0)
        cal = fit_band_calibration(truth, mean, std)
        assert 0.95 < cal.lam_nll < 1.05
        assert 0.95 < cal.lam_coverage < 1.05

    def test_coverage_fit_hits_nominal_on_fit_set(self):
        """The quantile fit makes the inflated band cover EXACTLY the
        nominal fraction of the cells it was fit on (up to quantile
        interpolation)."""
        rng = np.random.default_rng(3)
        truth, mean, std = _gaussian_bands(rng, understate=1.7)
        cal = fit_band_calibration(truth, mean, std)
        rep = band_report(truth, mean, std, lam=cal.lam)
        assert abs(rep["coverage"] - 0.95) < 5e-3

    def test_overdispersed_fit_deflates_but_applied_lam_floors_at_one(self):
        """The raw quantile fit on an over-dispersed validation set is < 1,
        but the APPLIED lam floors at 1 (only-inflate, round-5 default):
        shrinking on one sim's evidence transferred to 0.49/0.51 held-out
        coverage in the round-4 GP study (gp_at_scale_r4.json)."""
        rng = np.random.default_rng(4)
        truth, mean, std = _gaussian_bands(rng, understate=0.5)
        cal = fit_band_calibration(truth, mean, std)
        assert cal.lam_coverage < 0.6  # the unfloored fit is recorded
        assert cal.lam == 1.0  # ...but never applied as a shrink
        unfloored = fit_band_calibration(truth, mean, std, floor=0.0)
        assert unfloored.lam == unfloored.lam_coverage < 0.6

    def test_only_inflate_transfer(self):
        """The measured GP failure mode in miniature: validation bands
        over-dispersed (raw coverage ~1.0), test bands roughly calibrated.
        The unfloored shrink drives the test set UNDER nominal; the floored
        policy keeps it at its (adequate) raw coverage."""
        rng = np.random.default_rng(7)
        val = _gaussian_bands(rng, understate=0.4)   # validation over-covers
        test = _gaussian_bands(rng, understate=1.0)  # test is calibrated
        unfloored = fit_band_calibration(*val, floor=0.0)
        floored = fit_band_calibration(*val)
        cov_shrunk = band_report(*test, lam=unfloored.lam)["coverage"]
        cov_floored = band_report(*test, lam=floored.lam)["coverage"]
        assert cov_shrunk < 0.7  # the harmful transfer
        assert cov_floored > 0.93  # only-inflate preserves raw coverage


class TestReport:
    def test_before_after_coverage_improves_on_held_out(self):
        """Fit on a validation draw, apply to an independent test draw —
        the RESULTS.md section-5 protocol in miniature."""
        rng = np.random.default_rng(5)
        cal = fit_band_calibration(*_gaussian_bands(rng, understate=2.0))
        truth, mean, std = _gaussian_bands(rng, understate=2.0)
        before = band_report(truth, mean, std)
        after = band_report(truth, mean, std, lam=cal.lam)
        assert before["coverage"] < 0.75
        assert abs(after["coverage"] - 0.95) < 0.02
        assert after["mean_band"] == pytest.approx(before["mean_band"] * cal.lam, rel=1e-12)

    def test_spread_skill_invariant_under_scalar_inflation(self):
        rng = np.random.default_rng(6)
        truth, mean, std = _gaussian_bands(rng, understate=2.0)
        r1 = band_report(truth, mean, std)["spread_skill_r"]
        r2 = band_report(truth, mean, std, lam=3.0)["spread_skill_r"]
        assert r1 == pytest.approx(r2, rel=1e-9)

    def test_degenerate_spread_reports_none(self):
        truth = np.zeros(10)
        assert spread_skill(truth, truth, np.ones(10)) is None

    def test_zero_std_cells_floored_not_dropped(self):
        truth = np.array([0.0, 3.0])
        mean = np.array([0.0, 0.0])
        std = np.array([0.0, 1.0])
        z = standardized_errors(truth, mean, std)
        assert np.isfinite(z[0])  # exact-hit cell: z = 0 / floor = 0
        # Cell 0 covered (|0-0| <= 0), cell 1 not (3 > 1.96).
        assert coverage(truth, mean, std) == 0.5
