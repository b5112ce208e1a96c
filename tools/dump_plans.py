"""Dump ``explain("formatted")`` for catalog queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] [name ...]

Writes plans/<tag>/<query>_<suffix>.txt for each name (default: the
bench.py HEADLINE list).  The judge reads these files to check plan
claims (Exchange count, join strategy, PushedFilters) against the
code, so the dump is the raw formatted plan, unedited.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ena_database_build_spark.plans.catalog import CATALOG  # noqa: E402
from ena_database_build_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    if not names:
        import bench

        names = bench.HEADLINE
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = CATALOG[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
