"""Expression language (reference: m_fparser.f90)."""

import math

import numpy as np
import pytest

from eddy_currents_3d_tpu.models.expr import ExprError, compile_expression


def ev(text, **env):
    return float(compile_expression(text)(env))


def test_arithmetic():
    assert ev("1+2*3") == 7.0
    assert ev("(1+2)*3") == 9.0
    assert ev("2^3") == 8.0
    assert ev("2**3") == 8.0
    assert ev("-2^2") == -4.0          # unary minus binds looser than ^
    assert ev("2^-2") == 0.25
    assert ev("10/4") == 2.5
    assert ev("7-3-2") == 2.0          # left assoc
    assert ev("2^3^2") == 512.0        # right assoc


def test_div_by_zero_is_zero():
    # the reference VM aborts with result 0 (m_fparser.f90:180)
    assert ev("1/0") == 0.0
    assert ev("5+1/(t-t)", t=2.0) == 5.0


def test_functions():
    assert ev("cos(0)") == 1.0
    assert ev("sind(30)") == pytest.approx(0.5)
    assert ev("cosd(60)") == pytest.approx(0.5)
    assert ev("tgd(45)") == pytest.approx(1.0)
    assert ev("tg(0.5)") == pytest.approx(math.tan(0.5))
    assert ev("sh(1)") == pytest.approx(math.sinh(1))
    assert ev("ch(1)") == pytest.approx(math.cosh(1))
    assert ev("th(1)") == pytest.approx(math.tanh(1))
    assert ev("cth(1)") == pytest.approx(math.cosh(1) / math.sinh(1))
    assert ev("lg(100)") == pytest.approx(2.0)
    assert ev("lg(-1)") == 0.0         # error path returns 0
    assert ev("ln(e)", e=math.e) == pytest.approx(1.0)
    assert ev("sqrt(16)") == 4.0
    assert ev("abs(-3)") == 3.0
    assert ev("atg(1)") == pytest.approx(math.pi / 4)
    assert ev("asin(2)") == 0.0        # out of range -> 0
    assert ev("acos(0.5)") == pytest.approx(math.acos(0.5))


def test_step_functions():
    assert ev("impls(0.5)") == 1.0
    assert ev("impls(0)") == 0.0
    assert ev("impls(-1)") == 0.0
    assert ev("impl2(0)") == 1.0
    assert ev("impl2(-0.1)") == -1.0
    assert ev("pos(3)") == 3.0
    assert ev("pos(-3)") == 0.0


def test_rounding():
    assert ev("int(1.7)") == 1.0       # truncation (AINT)
    assert ev("int(-1.7)") == -1.0
    assert ev("nint(0.5)") == 1.0      # half away from zero (ANINT)
    assert ev("nint(-0.5)") == -1.0
    assert ev("nint(2.5)") == 3.0
    assert ev("floor(-1.2)") == -2.0
    assert ev("ceil(1.2)") == 2.0


def test_variables_case_insensitive():
    e = compile_expression("a*cos(p2*f*t)")
    assert float(e(A=2.0, P2=0.0, F=50.0, T=0.1)) == 2.0
    assert e.variables == frozenset({"A", "P2", "F", "T"})


def test_reference_source_expression():
    # the compare_to_Elmer source (compare_to_Elmer.vxc:197)
    e = compile_expression("a*cos(p2*f*t)")
    val = float(e(A=183 / (6 * 0.00333 * 6 * 0.00333), P2=2 * math.pi, F=50.0, T=0.001))
    expected = 183 / (6 * 0.00333 * 6 * 0.00333) * math.cos(2 * math.pi * 50 * 0.001)
    assert val == pytest.approx(expected, rel=1e-12)


def test_lim_velocity_expression():
    # LIM.vxc:547: a reciprocating drive via impl2(sind(...))
    e = compile_expression("a*impl2(sind(360*f*t))")
    assert float(e(A=2.0, F=5.0, T=0.01)) == 2.0
    assert float(e(A=2.0, F=5.0, T=0.11)) == -2.0


def test_unknown_variable_raises():
    with pytest.raises(ExprError):
        compile_expression("a*cos(t)", ["A"])
    with pytest.raises(ExprError):
        compile_expression("q+1")({})


def test_unknown_function_raises():
    with pytest.raises(ExprError):
        compile_expression("foo(1)")


def test_traced_evaluation():
    import jax
    import jax.numpy as jnp

    e = compile_expression("a*cos(p2*f*t)")
    f = jax.jit(lambda t: e(A=3.0, P2=2 * math.pi, F=50.0, T=t))
    assert float(f(0.0)) == pytest.approx(3.0)
    assert float(f(0.005)) == pytest.approx(3.0 * math.cos(math.pi / 2), abs=1e-12)


def test_exponent_formats():
    assert ev("1e-3") == 1e-3
    assert ev("1.5E2") == 150.0
    assert ev("2d0") == 2.0
