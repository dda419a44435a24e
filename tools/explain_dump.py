"""Dump .explain("formatted") for named registry queries to files.

    python tools/explain_dump.py SUFFIX QUERY [QUERY ...]

Writes plans/$SPARK_GRAFT_PLANROUND/<query>_<SUFFIX>.txt (round dir
defaults to r16) for each query (the optimization-round evidence
files: SUFFIX = "before" on the pre-change tree, "after" on the
optimized tree). Queries whose builders run eager work (checkpoint
loops, training collects) execute that work here — the dump is the
plan of the RETURNED frame, the same object the bench's noop write
executes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANROUND", "r16"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from lakehouse_spark_spark.plans.queries import registry
    from lakehouse_spark_spark.session import get_session

    spark = get_session("explain_dump")
    reg = registry()
    for name in names:
        df = reg[name].builder(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
