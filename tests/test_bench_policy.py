"""Pure-Python tests for bench.py's adaptive-rep headline policy.

No Spark: the policy decides, from rep durations alone, whether the
default bench should run another frontier rep (BASELINE.md "Host
regimes" — the shared host flaps between quiet and degraded windows on
a minutes timescale, and one contended cold rep must not set a round's
headline the way round 2's driver run did).
"""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

want_more = bench._want_more_frontier_reps


def test_always_best_of_two():
    # a fast first rep still gets a confirming second rep
    assert want_more([120.0])


def test_two_quiet_reps_stop():
    assert not want_more([120.0, 130.0])


def test_degraded_reps_keep_going_up_to_four():
    assert want_more([354.0])                      # round-2's exact case
    assert want_more([354.0, 300.0])               # still degraded, 3rd rep
    assert want_more([354.0, 300.0, 210.0])        # 4th rep allowed
    assert not want_more([354.0, 300.0, 210.0, 205.0])  # hard cap at 4


def test_quiet_rep_ends_the_loop():
    # a quiet window between flaps sets the headline and stops the loop
    assert not want_more([354.0, 150.0])


def test_wall_cap_blown_stops_immediately():
    # >= 600s rep: hostile window, bound the driver's bench wall clock
    assert not want_more([640.0])
    assert not want_more([354.0, 640.0, 590.0])  # total 1584 > 900
    assert not want_more([310.0, 320.0, 305.0])  # total 935 > 900 wall


def test_total_wall_budget():
    # under the 900s budget with a degraded best -> another rep
    assert want_more([250.0, 260.0])
    # over it -> stop even though best is degraded
    assert not want_more([450.0, 460.0])
