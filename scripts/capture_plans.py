"""Capture .explain("formatted") output for named queries into
plans/<round>/<query>_<tag>.txt (judge evidence for
OPTIMIZATION_<round>.md). Round dir defaults to r12; override with
SPARK_GRAFT_PLANS_ROUND.

Usage: python scripts/capture_plans.py <tag> <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from miningfrequentpattern_spark.session import get_session

    spark = get_session("mfp-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    outdir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    )
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
