"""Drive the driver contract end-to-end, the way the driver does:
entry() smoke at sf0.001, then every queries() entry vs its oracle_sql()
at sf0.01 — through __spark_entry__'s public functions only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from basin_cli_spark.oracle import compare, duckdb_connect  # noqa: E402
from basin_cli_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark(app_name="drive_contract")

    t0 = time.time()
    res = contract.entry(spark)
    rows = res.collect()
    print(f"entry(): {len(rows)} rows, schema={res.schema.simpleString()} "
          f"({time.time() - t0:.1f}s)")
    assert len(rows) >= 0

    qs, oracles = contract.queries(), contract.oracle_sql()
    con = duckdb_connect(sf_dir)
    failed = []
    for name, fn in qs.items():
        # scope each query's persisted intermediates to its own run —
        # orphaned cache entries would otherwise accumulate across the
        # whole registry (same discipline as bench.py's timing loop)
        spark.catalog.clearCache()
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        if name in oracles:
            ok, msg = compare(sdf, con.execute(oracles[name]).arrow())
            status = "OK " if ok else "FAIL"
            if not ok:
                failed.append((name, msg))
        else:
            n = sdf.count()
            status, msg = "ROWS", f"{n} rows (no oracle)"
            ok = True
        print(f"{status} {name:32s} {time.time() - t0:5.1f}s  {'' if ok else msg}")
    for name, msg in failed:
        print(f"\nFAIL {name}: {msg}")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} queries pass at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
