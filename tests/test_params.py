"""Parameter system: ini parsing of the reference's own ini files."""
import os

import pytest

from faspsolver_tpu import (AMGType, CycleType, SmootherType, SolverType,
                            parse_ini, param_init, InputParam)
from faspsolver_tpu.utils import FaspError, apply_cli_overrides

REF_INI = "/root/reference/test/ini"


def test_defaults_fanout():
    its, amg, ilu, swz = param_init()
    assert its.itsolver_type == SolverType.CG
    assert its.maxit == 500
    assert amg.max_levels == 20
    assert amg.strong_threshold == 0.3


@pytest.mark.skipif(not os.path.isdir(REF_INI), reason="no reference ini")
def test_parse_reference_input_dat():
    p = parse_ini(f"{REF_INI}/input.dat")
    assert p.problem_num == 10
    assert p.solver_type == 1
    assert p.AMG_type == AMGType.CLASSIC
    assert p.AMG_cycle_type == CycleType.V
    assert p.AMG_smoother == SmootherType.GS
    assert p.AMG_strong_threshold == 0.3
    assert p.AMG_coarse_scaling is False
    assert p.AMG_smooth_filter is False
    assert p.AMG_smooth_restriction is True


@pytest.mark.skipif(not os.path.isdir(REF_INI), reason="no reference ini")
def test_parse_all_reference_inis():
    for name in os.listdir(REF_INI):
        if name.endswith(".dat"):
            parse_ini(os.path.join(REF_INI, name))


def test_cli_overrides():
    p = apply_cli_overrides(["-solver", "4", "-tol", "1e-9", "-maxit", "77"])
    assert p.solver_type == 4
    assert p.itsolver_tol == 1e-9
    assert p.itsolver_maxit == 77


def test_bad_key_raises(tmp_path):
    f = tmp_path / "bad.dat"
    f.write_text("no_such_key = 3\n")
    with pytest.raises(FaspError):
        parse_ini(str(f))


def test_range_check(tmp_path):
    f = tmp_path / "bad.dat"
    f.write_text("AMG_strong_threshold = -0.5\n")
    with pytest.raises(FaspError):
        parse_ini(str(f))
