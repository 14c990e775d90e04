#!/usr/bin/env python3
"""Round-start environment probe (dev tool — run FIRST, before building).

The r9 regression (driver regenerated /root/testdata with a different
parquet timestamp physical type, silently breaking 32 queries) was
invisible from code alone. This probe makes any environment drift visible
in minute one: corpus file mtimes, per-table schemas with physical
timestamp annotations, row counts, and the /root/reference listing —
diffed against the expected contract baked in below.

Exit 0 = environment matches the documented contract.
Exit 1 = DRIFT DETECTED — re-baseline (SURVEY §1, loader, oracles) first.
"""
import glob
import os
import sys

import duckdb
import pyarrow
import pyarrow.parquet as pq

# Oracle engine versions (round-16 verdict item 2): the r15 `agg_cdf` red
# reproduced on the driver but not locally — a cross-engine rounding edge
# that could have been a DuckDB version skew. Record the versions in the
# contract line so any future red carries them.
print(f"oracle engines: duckdb={duckdb.__version__} pyarrow={pyarrow.__version__}")

# The documented contract (SURVEY.md §1, 2026-08-13 corpus): every
# timestamp column is us-precision with isAdjustedToUTC=false (NTZ).
EXPECTED_TS = {
    "events": {"ts"},
    "orders": {"o_orderdate"},
    "lineitem": {"l_shipdate"},
}
EXPECTED_TABLES = {
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
}

drift = []

# spark-avro connector probe (r10 verdict item 6): source_avro is
# environment-blocked, not builder-skipped — if the connector jar ever
# appears on the unmanaged classpath, claim the query that round with the
# same round-trip-aggregate oracle as ORC.
avro_jars = sorted(glob.glob("/opt/spark/jars/*spark-avro*.jar"))
upstream = sorted(os.path.basename(j) for j in glob.glob("/opt/spark/jars/avro-*.jar"))
print(f"spark-avro connector: {avro_jars or 'ABSENT (source_avro stays unclaimed)'}"
      f" (upstream avro libs only: {upstream})")
if avro_jars:
    drift.append("spark-avro connector jar PRESENT — claim source_avro this round")

# spark-sql-kafka connector probe (r11 verdict item 6): a Kafka source/sink
# would unlock a StreamingSpec leg against a real broker-format source; like
# avro it is environment-blocked today, so probe every round.
kafka_jars = sorted(glob.glob("/opt/spark/jars/*sql-kafka*.jar")) + \
    sorted(glob.glob("/opt/spark/jars/kafka-clients*.jar"))
print(f"spark-sql-kafka connector: {kafka_jars or 'ABSENT (kafka streaming leg stays unclaimed)'}")
if kafka_jars:
    drift.append("kafka connector jar PRESENT — claim a kafka StreamingSpec leg this round")

ref = sorted(os.listdir("/root/reference")) if os.path.isdir("/root/reference") else None
print(f"/root/reference: {len(ref) if ref is not None else 'MISSING'} entries")
if ref:
    drift.append(f"/root/reference is no longer empty ({len(ref)} entries) — re-read it")

for sf in sorted(glob.glob("/root/testdata/sf*")):
    names = set()
    for f in sorted(glob.glob(f"{sf}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        names.add(name)
        meta = pq.ParquetFile(f)
        schema = meta.schema_arrow
        ts_cols = {}
        for field in schema:
            t = field.type
            if "timestamp" in str(t):
                ts_cols[field.name] = f"{t}" + ("" if t.tz else " (NTZ)")
        mtime = os.path.getmtime(f)
        print(f"{sf}/{name}: rows={meta.metadata.num_rows} mtime={mtime:.0f} ts={ts_cols or '-'}")
        exp = EXPECTED_TS.get(name, set())
        if set(ts_cols) != exp:
            drift.append(f"{sf}/{name}: timestamp columns {set(ts_cols)} != expected {exp}")
        for c, desc in ts_cols.items():
            if desc != "timestamp[us] (NTZ)":
                drift.append(f"{sf}/{name}.{c}: physical type {desc} != expected timestamp[us] (NTZ)")
    if names != EXPECTED_TABLES:
        drift.append(f"{sf}: tables {sorted(names ^ EXPECTED_TABLES)} differ from contract")

if drift:
    print("\nDRIFT DETECTED — re-baseline before building:")
    for d in drift:
        print(f"  - {d}")
    sys.exit(1)
print("\nenvironment matches the documented contract")
