#!/usr/bin/env python3
"""Re-measure the BASELINE.md headline comparable set in DuckDB (dev tool).

The 2x perf gate is defined over 9 representative queries (BASELINE.md,
"Measured baseline"). The original 2026-08-12 numbers predate the corpus
regeneration, so this script recomputes them on the CURRENT corpus: it
runs each member's oracle SQL (dumped by graft.Verify — the exact
semantics the engine is graded on) plus an all-pairs cosine top-5 for the
non-oracled sim_topk, threads=4, cold + warm.

Usage: python3 tools/baseline_duck.py <sfDir> <verifyOutDir>
(the verifyOutDir must contain oracle_sql.json from a graft.Verify run)
"""
import glob
import json
import sys
import time

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v10"

HEADLINE = ["agg_group", "join_inner", "topk_per_group", "sessionize",
            "sim_topk", "text_wordcount", "caim_quanta", "fn_json",
            "dedup_exact"]

# sim_topk has no oracle entry (float-rank ties): brute-force cosine
# top-5 per vector, the same shape BASELINE.md measured originally.
COSINE_TOPK = """
WITH v AS (SELECT vec_id, embedding e,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x*x AS DOUBLE)))) n
           FROM embeddings),
     p AS (SELECT a.vec_id a_id, b.vec_id b_id,
             list_sum(list_transform(range(1, len(a.e)+1),
               i -> CAST(a.e[i] AS DOUBLE)*CAST(b.e[i] AS DOUBLE)))/(a.n*b.n) sim
           FROM v a, v b WHERE a.vec_id <> b.vec_id AND a.n > 0 AND b.n > 0)
SELECT a_id, b_id, sim FROM
  (SELECT a_id, b_id, sim,
     row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) rn FROM p)
WHERE rn <= 5 ORDER BY a_id, rn
"""

oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
con.execute("SET threads=4")
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

rows = []
for q in HEADLINE:
    sql = COSINE_TOPK if q == "sim_topk" else oracle[q]
    t0 = time.time(); con.execute(sql).fetchall(); cold = time.time() - t0
    t0 = time.time(); con.execute(sql).fetchall(); warm = time.time() - t0
    rows.append((q, cold, warm))
    print(f"{q}: cold {cold:.3f}s warm {warm:.3f}s")

print(f"\nheadline DuckDB total: cold {sum(r[1] for r in rows):.2f}s "
      f"warm {sum(r[2] for r in rows):.2f}s (threads=4, {sf})")

# Round-12 (verdict item 7): journal the oracle timings alongside the Spark
# bench journal, metric-tagged so Bench.scala's median loader (which filters
# metric == "total") never confuses the two. With these lines committed, the
# headline Spark/DuckDB ratio is derivable from artifacts alone for ANY run,
# instead of against one frozen BASELINE.md table — DuckDB-side drift on a
# corpus regen shows up as a journal step, automatically.
import datetime
import os
hist = sys.argv[3] if len(sys.argv) > 3 else "BENCH_HISTORY.jsonl"
line = {
    "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    "metric": "oracle_headline", "unit": "sec", "threads": 4,
    "value": round(sum(r[2] for r in rows), 3),
    "value_cold": round(sum(r[1] for r in rows), 3),
    "queries": {q: round(w, 3) for q, _, w in rows},
    "queries_cold": {q: round(c, 3) for q, c, _ in rows},
    "sf": os.path.basename(sf.rstrip("/")),
}
with open(hist, "a") as f:
    f.write(json.dumps(line, separators=(",", ":")) + "\n")
print(f"journaled oracle timings -> {hist}")
