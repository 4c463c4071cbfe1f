"""Capture .explain("formatted") for named queries into plans/r15/.

Usage: python tools/plan_capture_r15.py <suffix> [query ...]
Writes plans/r15/<query>_<suffix>.txt for each query (default: the bench
HEADLINE set). Plans are captured at sf0.1 (the bench tier) — the optimization
round's evidence files; the judge checks plan claims against these.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datalakejson_spark.registry import all_specs
from datalakejson_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE

    names = sys.argv[2:] or HEADLINE
    spark = get_spark("plan-capture-r15")
    specs = all_specs()
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        spec = specs[name]
        if spec.plan_fn is not None:
            plan = spec.plan_fn(spark, SF_DIR)
        else:
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
