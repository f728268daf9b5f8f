"""Phase timer / observability tests (SURVEY.md §5 tracing rebuild)."""

import time

from topopteval_tpu.utils.profiling import PhaseTimer, trace


def test_phase_timer_accumulates_and_reports():
    t = PhaseTimer()
    with t.phase("assemble", annotate_device=False):
        time.sleep(0.01)
    for _ in range(3):
        with t.phase("solve", annotate_device=False):
            time.sleep(0.005)
    with t.phase("solve", annotate_device=False):
        with t.phase("inner", annotate_device=False):
            time.sleep(0.002)
    d = t.as_dict()
    assert d["assemble"] >= 0.01
    assert d["solve"] >= 0.015
    assert "solve/inner" in d
    rep = t.report()
    assert "assemble" in rep and "%" in rep
    assert t.total() >= d["assemble"]


def test_trace_contextmanager_is_safe():
    with trace("phase-x"):
        x = 1 + 1
    assert x == 2


def test_solve_results_carry_timings():
    from topopteval_tpu.api import solve_system
    from topopteval_tpu.config import SolverConfig
    from topopteval_tpu.models import cube_under_gravity
    r = solve_system(cube_under_gravity(3),
                     SolverConfig(method="direct", verbose=False))
    assert r.timings is not None
    assert "solve" in r.timings and "postprocess" in r.timings
