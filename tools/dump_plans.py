"""Dump .explain("formatted") for registry queries to plans/r09/.

Usage: python tools/dump_plans.py <suffix> [query,query,...]
Writes plans/r09/<query>_<suffix>.txt for each selected query (default:
the declared 50-query tier). Plan construction is driver-side only —
nothing executes — so this is safe to run alongside other jobs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decaton_spark import get_spark  # noqa: E402
from decaton_spark.plans.inspect import plan_of  # noqa: E402
from decaton_spark.queries import _ALL_QUERIES, QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = (
        [n for n in sys.argv[2].split(",") if n]
        if len(sys.argv) > 2
        else sorted(QUERIES)
    )
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = _ALL_QUERIES[name].fn(spark, SF_DIR)
            txt = plan_of(df, "formatted")
        except Exception as ex:  # pragma: no cover - diagnostic path
            txt = f"ERROR building plan: {ex}"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
