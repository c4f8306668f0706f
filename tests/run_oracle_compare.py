"""Dev harness: run every queries() entry against its DuckDB oracle.

Usage: python tests/run_oracle_compare.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tests.oracle_compare import compare_one, duck_con  # noqa: E402


def main() -> int:
    import __spark_entry__ as entrymod
    from combinedfeatureextraction_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(cpus=8)
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = compare_one(spark, con, name, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "ok": False, "why": f"EXC {type(e).__name__}: {e}"}
        dt = time.time() - t0
        status = "OK " if res.get("ok") else "FAIL"
        if not res.get("ok"):
            n_fail += 1
        print(f"{status} {name:24s} {dt:6.1f}s {res.get('mode','')} rows={res.get('rows')} {res.get('why','')}")
        if not res.get("ok") and "sample_diff" in res:
            for x, y in res["sample_diff"]:
                print("   spark :", x)
                print("   oracle:", y)
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
