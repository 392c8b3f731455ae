"""Suite resolution of the flagship-training study (studies/flagship_training.py).

Regressions pinned here:
- resolution is idempotent (the old code mutated module globals cumulatively:
  two in-process main() calls on --suite mixed trained on 48 sims with the
  diurnal members duplicated on the batch axis);
- --extra-train parsing matches the CLI's ``_sims`` (strips whitespace after
  commas instead of crashing deep in the catalog lookup);
- the diurnal physics flag follows suite MEMBERSHIP, not the --suite enum
  (an --extra-train diurnal member on the standard suite used to train with
  its surface-flux cycle silently frozen at sin(0)=0 while the checkpoint
  meta recorded diurnal=true).
"""

from studies.flagship_training import (
    TEST_FILES_DIURNAL,
    TEST_FILES_STANDARD,
    TRAIN_FILES_DIURNAL,
    TRAIN_FILES_STANDARD,
    resolve_suite,
)


def test_resolution_is_idempotent():
    first = resolve_suite("mixed", "wind_-1.5e-4_heating_-2e-8")
    second = resolve_suite("mixed", "wind_-1.5e-4_heating_-2e-8")
    assert first == second
    assert len(first[0]) == len(TRAIN_FILES_STANDARD) + len(TRAIN_FILES_DIURNAL) + 1


def test_suites():
    train, test, diurnal = resolve_suite("standard")
    assert train == list(TRAIN_FILES_STANDARD) and test == list(TEST_FILES_STANDARD)
    assert not diurnal
    train, test, diurnal = resolve_suite("diurnal")
    assert train == list(TRAIN_FILES_DIURNAL) and test == list(TEST_FILES_DIURNAL)
    assert diurnal
    train, test, diurnal = resolve_suite("mixed")
    assert train == list(TRAIN_FILES_STANDARD) + list(TRAIN_FILES_DIURNAL)
    assert diurnal


def test_extra_train_strips_whitespace():
    train, _, _ = resolve_suite(
        "standard", "wind_-1.5e-4_heating_-2e-8, wind_-2e-4_heating_-3.5e-8"
    )
    assert train[-2:] == ["wind_-1.5e-4_heating_-2e-8", "wind_-2e-4_heating_-3.5e-8"]


def test_diurnal_follows_membership_not_enum():
    _, _, diurnal = resolve_suite("standard", "wind_-2e-4_diurnal_2e-8")
    assert diurnal
