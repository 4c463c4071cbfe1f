"""Calibration self-check (bench.py + tools/bench_history.py, round 10).

The bench's box-normalization kernel can OVER-correct: r8's numpy_mt read
its box 1.85x slow while the measured sf1 wall-clock drift of the unchanged
headline queries was ~1.15x, so dividing by the kernel misread the fastest
round on record as a 45% regression (VERDICT r9 "what's wrong #1"). These
tests pin the self-check that adjudicates kernel-vs-wall-clock: a kernel
deviation >1.3x nominal that the sf1 drift contradicts by >1.3x flags the
round box-anomalous; a genuinely slow box (kernel and wall clock agree)
does not. No Spark session needed — pure driver-side logic.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from bench import SF1_NOMINAL_REF, calibration_check  # noqa: E402
from bench_history import apply_calibration_checks, load_rounds  # noqa: E402

# r8's actual artifact values — the case that motivated the check.
R8_NUMPY_MT = 2.2499
R8_SF1 = {
    "g3_flagship_pricing_summary": 0.919,
    "j3_star_join_revenue": 1.765,
    "j5_left_outer_join": 0.602,
    "g4_count_distinct_users": 0.373,
    "g6_rollup_time_hierarchy": 0.906,
    "w1_ranking": 1.204,
    "w3_running_sum": 0.678,
    "f3_json_extraction": 0.603,
    "t4_tumbling_window": 0.34,
    "l1_exact_dedup": 0.295,
    "l2_minhash_lsh_pairs": 2.233,
    "l3_cosine_topk": 0.922,
}


def test_r8_shape_is_flagged_anomalous():
    c = calibration_check(R8_NUMPY_MT, R8_SF1)
    assert c["box_anomalous"] is True
    assert c["kernel_deviation"] > 1.8
    # The wall clock moved far less than the kernel claimed.
    assert c["sf1_raw_drift_vs_ref"] < 1.3


def test_nominal_box_not_flagged():
    c = calibration_check(1.2159, dict(SF1_NOMINAL_REF))
    assert c["box_anomalous"] is False


def test_genuinely_slow_box_not_flagged():
    # Kernel 2x AND wall clock 2x: the division is the right correction.
    slow = {k: 2 * v for k, v in SF1_NOMINAL_REF.items()}
    c = calibration_check(2.4, slow)
    assert c["box_anomalous"] is False
    assert abs(c["sf1_raw_drift_vs_ref"] - 2.0) < 0.01


def test_genuinely_fast_box_not_flagged():
    fast = {k: 0.5 * v for k, v in SF1_NOMINAL_REF.items()}
    c = calibration_check(0.6, fast)
    assert c["box_anomalous"] is False


def test_no_sf1_data_yields_no_verdict():
    # Without wall-clock evidence the check must not guess either way.
    c = calibration_check(2.4, {})
    assert "box_anomalous" not in c
    assert c["kernel_deviation"] == 2.0


def test_history_retro_check_flags_r8_only():
    """Against the real recorded artifacts: exactly r8 is box-anomalous,
    and every nominal-kernel round passes its own check."""
    rounds = load_rounds()
    apply_calibration_checks(rounds)
    flagged = {
        n
        for n, r in rounds.items()
        if (r["check"] or {}).get("box_anomalous")
    }
    assert 8 in flagged
    for n in flagged - {8}:
        # Future driver boxes may legitimately flag; but any flagged round
        # must carry the contradiction evidence, not a bare verdict.
        c = rounds[n]["check"]
        assert c["kernel_deviation"] > 1.3 or c["kernel_deviation"] < 1 / 1.3
        assert "sf1_raw_drift_vs_ref" in c
