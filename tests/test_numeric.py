"""SPICE-prefix number parsing (reference: utilites.f90:343-475)."""

import pytest

from eddy_currents_3d_tpu.utils.numeric import spice_to_float


@pytest.mark.parametrize(
    "text,expected",
    [
        ("100m", 0.1),
        ("5m", 5e-3),
        ("1m", 1e-3),
        ("0.4m", 0.4e-3),
        ("1k", 1e3),
        ("1k3", 1.3e3),       # prefix as decimal point
        ("2meg", 2e6),
        ("3u", 3e-6),
        ("10n", 1e-8),
        ("1p", 1e-12),
        ("2pet", 2e15),
        ("4f", 4e-15),
        ("7c", 0.07),
        ("2h", 200.0),
        ("5g", 5e9),
        ("6t", 6e12),
        ("1e-3", 1e-3),
        ("-0.95", -0.95),
        ("50", 50.0),
        ("0", 0.0),
        ("1,5", 1.5),          # comma as decimal point
        ("10000", 10000.0),
    ],
)
def test_values(text, expected):
    assert spice_to_float(text) == pytest.approx(expected, rel=1e-12)


def test_garbage_returns_zero():
    assert spice_to_float("") == 0.0
    assert spice_to_float("xyz") == 0.0


def test_case_insensitive():
    assert spice_to_float("5M") == 5e-3
    assert spice_to_float("2MEG") == 2e6
