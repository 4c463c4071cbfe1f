"""Generate BENCH_HISTORY.md — cross-round headline-bench history.

``python tools/bench_history.py`` reads every BENCH_r{N}.json the driver has
recorded and tabulates:

1. RAW per-query sf0.1 seconds per round. BENCH_r07's artifact is not
   machine-parseable (the payload outgrew the driver's 2000-char tail before
   the round-8 emission fix), but its tail carries the sf1 block and the
   per-query scaling exponents, so r7's sf0.1 numbers are RECONSTRUCTED as
   t_sf0.1 = t_sf1 / 10^e and marked with an asterisk.
2. CALIBRATED units (sec / numpy_mt_sec) for every round whose artifact
   carries the bench.py calibration kernel (r8 onward; r7's local-session
   constant numpy_mt ~= 1.2 is recorded in STATUS.md but was truncated out
   of the official artifact, so r7 calibrated cells are reconstructed and
   asterisked too).

Raw seconds across rounds conflate code changes with driver-box speed:
r5 -> r6 showed a uniform +15-45% drift on unchanged queries that an
interleaved on-box A/B adjudicated as "box, not code" (VERDICT r7), and the
r3 -> r4 jump has the same uniform-shift signature. The calibrated series is
the one to trend; the raw table is kept because it is what the driver
actually measured.

SELF-CHECK (round 10, VERDICT r9 "what's wrong #1"): the kernel can
OVER-correct — r8's numpy_mt read its box 1.85x slow while the median sf1
raw drift of the unchanged headline queries vs the nearest nominal-kernel
round was only ~1.15x (the AVX kernel throttles harder than Spark JVM wall
time), so r8's calibrated cells divide by ~1.9x too much and made the
genuinely fastest rounds look like regressions. Every calibrated column is
therefore cross-checked: when a round's kernel deviates >1.3x from the
1.2 s nominal AND the measured sf1 drift vs the nearest nominal-kernel
round contradicts it by >1.3x, the column is marked box-anomalous (dagger +
footnote) and must NOT be trended. bench.py >= r10 records the same check
at emission time (``calibration_check`` in the artifact); older artifacts
get it retroactively from their tail's sf1 block.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))  # for `from bench import calibration_check`

# Round-over-round annotations established by prior verdicts (kept in the
# generator so regeneration never loses them).
NOTES = [
    "r3 -> r4 raw jump (+62% total) is a uniform shift across unchanged "
    "queries - same box-drift signature later proven for r5 -> r6.",
    "r5 -> r6 drift adjudicated 'box, not code' by interleaved on-box A/B "
    "at the r5/r6 commits (VERDICT r7): min-of-mins within +/-10%, r6 "
    "marginally faster.",
    "r7 cells (*) are reconstructed: sf0.1 = sf1 / 10^exponent from the "
    "artifact tail (the pre-fix emission truncated the sf0.1 block); "
    "calibrated cells divide by the ~=1.2 s numpy_mt constant recorded in "
    "STATUS.md r7, not a same-run measurement.",
    "Calibrated units = sec / numpy_mt_sec measured in the SAME session "
    "right after the query block (bench.py kernel, frozen definition); "
    "they are box-independent and are the series to trend - EXCEPT "
    "box-anomalous (!) columns, where the kernel's reading is contradicted "
    "by the measured sf1 wall-clock drift and the division over-corrects.",
    "r8 (!) adjudication (VERDICT r9): numpy_mt 2.25 read the box 1.87x "
    "slow, but r8's sf1 raw was WITHIN ~15% of both neighbors (10.84 s vs "
    "r7 11.15 / r9 9.36) - the AVX kernel throttled far harder than Spark "
    "JVM wall time, so r8's calibrated cells divide by ~1.9x too much. On "
    "nominal-box raw, r9 is the fastest round of the first nine.",
]


def load_rounds() -> dict[int, dict]:
    """round -> {queries: {name: sec}, total, calibration, calibrated,
    sf1_queries, check, reconstructed: bool}"""
    out: dict[int, dict] = {}
    for p in sorted(REPO.glob("BENCH_r*.json")):
        n = int(re.search(r"BENCH_r(\d+)", p.name).group(1))
        d = json.loads(p.read_text())
        tail = d.get("tail", "")
        m_sf1 = re.search(r'"sf1": ({.*?"sf": 1\.0})', tail)
        sf1_q = json.loads(m_sf1.group(1))["queries"] if m_sf1 else {}
        parsed = d.get("parsed")
        if parsed:
            out[n] = {
                "queries": parsed.get("queries", {}),
                "total": parsed.get("value"),
                "calibration": parsed.get("calibration"),
                "calibrated": parsed.get("queries_calibrated"),
                "check": parsed.get("calibration_check"),
                "sf1_queries": sf1_q,
                "reconstructed": False,
            }
            continue
        # Unparseable artifact: reconstruct from the tail's sf1 block +
        # per-query exponents (t_sf0.1 = t_sf1 / 10^e).
        m_exp = re.search(r'"scaling_exponent": ({[^{}]*})', tail)
        if not (m_sf1 and m_exp):
            continue
        exp = json.loads(m_exp.group(1))
        qs = {
            name: round(t / (10 ** exp[name]), 3)
            for name, t in sf1_q.items()
            if name in exp
        }
        out[n] = {
            "queries": qs,
            "total": round(sum(qs.values()), 3),
            "calibration": None,
            "calibrated": None,
            "check": None,
            "sf1_queries": sf1_q,
            "reconstructed": True,
        }
    return out


def apply_calibration_checks(rounds: dict[int, dict]) -> None:
    """Fill each calibrated round's ``check`` (kernel_deviation,
    sf1_raw_drift, box_anomalous) when the artifact didn't record one
    (pre-r10), using bench.py's ``calibration_check`` — ONE definition of
    the adjudication math for emission-time and retroactive checks. The
    cross-check reference is the NEAREST round whose own kernel read
    nominal (within 1.3x) and which has sf1 per-query data — so the drift
    measures box movement, not a decade of code changes."""
    from bench import NOMINAL_NUMPY_MT, calibration_check

    def mt(n: int) -> float | None:
        cal = rounds[n]["calibration"]
        if cal and cal.get("numpy_mt_sec"):
            return cal["numpy_mt_sec"]
        return R7_NUMPY_MT if rounds[n]["reconstructed"] else None

    nominal_rounds = [
        n
        for n in rounds
        if mt(n) is not None
        and 1 / 1.3 <= mt(n) / NOMINAL_NUMPY_MT <= 1.3
        and rounds[n]["sf1_queries"]
    ]
    for n, r in rounds.items():
        if r["check"] is not None or mt(n) is None:
            continue
        refs = [m for m in nominal_rounds if m != n]
        ref = (
            rounds[min(refs, key=lambda m: abs(m - n))]["sf1_queries"]
            if refs
            else {}
        )
        r["check"] = calibration_check(mt(n), r["sf1_queries"] or {}, ref=ref)


# STATUS.md r7 records the builder session's calibration constant; used only
# for the asterisked r7 calibrated column.
R7_NUMPY_MT = 1.2


def render(rounds: dict[int, dict]) -> str:
    ns = sorted(rounds)
    names = sorted({q for r in rounds.values() for q in r["queries"]})
    star = lambda n: "*" if rounds[n]["reconstructed"] else ""  # noqa: E731

    lines = [
        "# BENCH_HISTORY - cross-round headline bench",
        "(generated by tools/bench_history.py - regenerate, don't edit)",
        "",
        "## Raw seconds, sf0.1 driver runs",
        "",
        "| query | " + " | ".join(f"r{n}{star(n)}" for n in ns) + " |",
        "|---|" + "---|" * len(ns),
    ]
    for q in names:
        row = [
            ("%.3f" % rounds[n]["queries"][q]) if q in rounds[n]["queries"] else "-"
            for n in ns
        ]
        lines.append(f"| {q} | " + " | ".join(row) + " |")
    lines.append(
        "| **total** | "
        + " | ".join("%.2f" % rounds[n]["total"] for n in ns)
        + " |"
    )

    cal_ns = [
        n for n in ns if rounds[n]["calibrated"] or rounds[n]["reconstructed"]
    ]
    anomalous = lambda n: bool(  # noqa: E731
        (rounds[n]["check"] or {}).get("box_anomalous")
    )
    dag = lambda n: "(!)" if anomalous(n) else ""  # noqa: E731
    lines += [
        "",
        "## Calibrated units (sec / numpy_mt_sec, box-independent)",
        "",
        "(!) = box-anomalous column: the kernel's claimed deviation is "
        "contradicted by the measured sf1 raw drift — do NOT trend these "
        "cells (see self-check notes below).",
        "",
        "| query | " + " | ".join(f"r{n}{star(n)}{dag(n)}" for n in cal_ns) + " |",
        "|---|" + "---|" * len(cal_ns),
    ]

    def cal_cell(n: int, q: str) -> str:
        r = rounds[n]
        if r["calibrated"] and q in r["calibrated"]:
            return "%.2f" % r["calibrated"][q]
        if r["reconstructed"] and q in r["queries"]:
            return "%.2f" % (r["queries"][q] / R7_NUMPY_MT)
        return "-"

    for q in names:
        lines.append(
            f"| {q} | " + " | ".join(cal_cell(n, q) for n in cal_ns) + " |"
        )
    mt = lambda n: (  # noqa: E731
        (rounds[n]["calibration"] or {}).get("numpy_mt_sec")
        or (R7_NUMPY_MT if rounds[n]["reconstructed"] else None)
    )
    lines.append(
        "| numpy_mt_sec | "
        + " | ".join("%.3f" % mt(n) if mt(n) else "-" for n in cal_ns)
        + " |"
    )
    # Self-check rows: rendered from the recorded/retro-computed check so
    # regeneration keeps the evidence next to the numbers it qualifies.
    checks = [(n, rounds[n]["check"]) for n in cal_ns if rounds[n]["check"]]
    if checks:
        lines += ["", "### Calibration self-check", ""]
        for n, c in checks:
            verdict = (
                "BOX-ANOMALOUS - cells over-correct, do not trend"
                if c.get("box_anomalous")
                else "ok"
            )
            drift = c.get("sf1_raw_drift_vs_ref")
            lines.append(
                f"- r{n}: kernel deviation {c['kernel_deviation']}x nominal"
                + (f", sf1 raw drift {drift}x vs nearest nominal-kernel round"
                   if drift is not None else "")
                + f" -> {verdict}."
            )
    lines += ["", "## Notes", ""]
    lines += [f"- {note}" for note in NOTES]
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    rounds = load_rounds()
    apply_calibration_checks(rounds)
    md = render(rounds)
    out = REPO / "BENCH_HISTORY.md"
    out.write_text(md)
    sys.stdout.write(f"wrote {out} ({len(rounds)} rounds)\n")
