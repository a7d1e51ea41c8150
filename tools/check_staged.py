"""Driver-grade compare for the STAGED (spark_fn, oracle) pairs at an
arbitrary sf directory — the sf0.01 companion to tests/test_staging.py
(which pins sf0.001 in the suite).

Usage:  python tools/check_staged.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from nonconsumptive_spark.queries import Query
    from nonconsumptive_spark.queries.staging import STAGED
    from nonconsumptive_spark.session import get_spark
    from tools.check_oracle import compare_query, duck_connection

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark("staged-check")
    con = duck_connection(sf_dir)
    failed = 0
    for name in sorted(STAGED):
        if only and name not in only:
            continue
        fn, oracle = STAGED[name]
        try:
            res = compare_query(spark, con, name,
                                Query(name, fn, oracle), sf_dir)
        except Exception as e:
            res = {"name": name, "status": "ERROR",
                   "problems": [str(e)[:500]]}
        print(f"{res['status']:>9}  {name:28s} rows={res.get('rows', '?')}")
        for p in res.get("problems", []):
            print(f"           ! {p}")
            failed += 1
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
