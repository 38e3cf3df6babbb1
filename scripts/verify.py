"""Driver-faithful verification (see .claude/skills/verify/SKILL.md):
entry() smoke + every queries()/oracle_sql() pair vs DuckDB at sf0.01.

The value hash is STRING-canonical: Decimal values keep their decimal
string form ('1.000000'), floats keep repr(float) ('1.0') — so a
Spark DECIMAL output vs a DuckDB float64 output MISMATCHES here just
like it does at the driver's gate (coercing Decimal→float before
hashing hid exactly that failure class in round 1).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import __spark_entry__ as m
import duckdb, hashlib
import numpy as np
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
print("entry rows:", len(m.entry(spark).collect()))
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
def _c(v):
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return str(v)  # Decimal -> '1.000000', str, Timestamp, ...
def vhash(pdf):
    cols = sorted(pdf.columns)
    canon = sorted("|".join(_c(v) for v in r)
                   for r in pdf[cols].itertuples(index=False))
    return hashlib.md5("\n".join(canon).encode()).hexdigest()[:12]
qs, os_ = m.queries(), m.oracle_sql()
# manifest of the round's ordering so any artifact's 50-key window is
# auditable after later rotations (SURVEY §5 window policy)
import json
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "queries_order.json"), "w") as fh:
    json.dump({"order": list(qs), "window": list(qs)[:50],
               "oracle_gated": [k for k in qs if k in os_]}, fh, indent=1)
    fh.write("\n")
bad = 0
for k, fn in qs.items():
    s = fn(spark, sf).toPandas()
    if k not in os_:
        print(f"{k}: rows-only {len(s)}"); continue
    d = con.sql(os_[k]).df()
    ok = len(s) == len(d) and vhash(s) == vhash(d)
    bad += not ok
    print(f"{k}: rows {len(s)}/{len(d)} -> {'MATCH' if ok else 'MISMATCH'}")
print("FAIL" if bad else "ALL MATCH")
