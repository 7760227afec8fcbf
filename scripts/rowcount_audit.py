"""Report queries returning 0 rows per SF — a 0-row oracle match is a
vacuous pass (verify SKILL gotcha); predicates should be chosen so
every query is non-trivial at every SF."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from i3cols_spark.session import get_spark


def main() -> None:
    spark = get_spark("rowcount-audit", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as mod

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        zeros = []
        for name, fn in sorted(mod.queries().items()):
            n = fn(spark, sf_dir).count()
            if n == 0:
                zeros.append(name)
        print(f"ZEROES {sf_dir}: {zeros or 'none'}")


if __name__ == "__main__":
    main()
