"""Full-registry schema/dtype audit: for every oracle-backed query, compare
the Spark output schema's type class against the DuckDB oracle's Arrow
result schema class, column by column, and flag raw container outputs.

This is the diagnostic behind the round-8 oracle.py hardening — the class
pairs it prints on currently-green queries define the equivalences the
strict compare() may allow; anything else is a driver hash risk.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basin_cli_spark.oracle import (  # noqa: E402
    arrow_type_class as arrow_class,
    duckdb_connect,
    spark_type_class as spark_class,
)
from basin_cli_spark.queries import load_all  # noqa: E402
from basin_cli_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark(app_name="audit_dtypes")
    con = duckdb_connect(sf_dir)
    queries = load_all()
    n_flagged = 0
    for name, spec in queries.items():
        try:
            sdf = spec.fn(spark, sf_dir)
            s_classes = {f.name: spark_class(f.dataType) for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: spark build failed: {e}")
            n_flagged += 1
            continue
        for c, cls in s_classes.items():
            if cls.startswith("CONTAINER"):
                print(f"FLAG {name}.{c}: spark outputs {cls}")
                n_flagged += 1
        if spec.oracle is None:
            continue
        try:
            tbl = con.execute(spec.oracle).arrow()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: oracle failed: {e}")
            n_flagged += 1
            continue
        o_classes = {f.name: arrow_class(f.type) for f in tbl.schema}
        for c in sorted(set(s_classes) | set(o_classes)):
            sc, oc = s_classes.get(c, "<missing>"), o_classes.get(c, "<missing>")
            if sc != oc:
                print(f"DIFF {name}.{c}: spark={sc} oracle={oc}")
                n_flagged += 1
        spark.catalog.clearCache()
    print(f"\n{n_flagged} findings across {len(queries)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
