"""Driver-shaped end-to-end harness: default SparkSession (no engine
configs), sf0.01, side-by-side DuckDB oracle comparison."""
import sys, json
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = __import__("os").environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").getOrCreate())  # deliberately untuned
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()[:120]}")
assert len(rows) > 0

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

# The comparison lives in tools/harness_compare.py (round 8) so the
# gate itself has a liveness pin — tests/test_gate_liveness.py feeds
# corrupted frames through the SAME compare this script runs.
from harness_compare import compare  # noqa: E402

qs, oracles = e.queries(), e.oracle_sql()
if "--all" in sys.argv:  # sweep the EXTRA tier too (full registry)
    from decaton_spark.queries import EXTRA_QUERIES

    qs = dict(qs)
    for name, spec in EXTRA_QUERIES.items():
        qs[name] = spec.fn
        if spec.oracle is not None:
            oracles[name] = spec.oracle
if "--only" in sys.argv:  # fast iteration: certify a comma-separated subset
    from decaton_spark.queries import EXTRA_QUERIES

    # Filter falsy names FIRST: "".split(",") == [""], so without this
    # an empty --only argument hit the unknown-name branch as [''] and
    # the dedicated empty-list message was dead code (ADVICE r7).
    wanted = [n for n in sys.argv[sys.argv.index("--only") + 1].split(",") if n]
    if not wanted:
        sys.exit("--only: empty query list")
    # fail LOUDLY on unknown names: a typo must not shrink the audited
    # set and print a green "0/0 ok" (self-review r7; matches
    # scale_ladder._selected)
    unknown = [n for n in wanted if n not in qs and n not in EXTRA_QUERIES]
    if unknown:
        sys.exit(f"--only: unknown queries {unknown}")
    for name in wanted:
        if name not in qs and name in EXTRA_QUERIES:
            qs[name] = EXTRA_QUERIES[name].fn
            if EXTRA_QUERIES[name].oracle is not None:
                oracles[name] = EXTRA_QUERIES[name].oracle
    qs = {k: v for k, v in qs.items() if k in set(wanted)}
results = {}
walls: dict[str, float] = {}
import time as _time

for name, fn in sorted(qs.items()):
    _t0 = _time.perf_counter()
    try:
        sdf = fn(spark, SF).toPandas()
        # Spark wall only (collect-to-pandas included, DuckDB oracle
        # compare excluded) — a cheap per-round trace so a query whose
        # sf0.01 wall jumps between rounds is visible in the harness
        # log without a separate timing sweep
        walls[name] = round(_time.perf_counter() - _t0, 2)
        if name not in oracles:
            # rows-only is the WEAKER gate for non-SQL-expressible ops;
            # it must still be falsifiable — an empty frame is a FAIL
            # (self-review r7: the unconditional pass meant an
            # oracle-less query could never fail this harness)
            results[name] = (
                f"rows-only: {len(sdf)} rows"
                if len(sdf) > 0
                else "EMPTY: rows-only query returned 0 rows"
            )
            continue
        odf = con.sql(oracles[name]).df()
        results[name] = compare(sdf, odf)
    except Exception as ex:
        results[name] = f"ERROR: {str(ex)[:200]}"
        walls.setdefault(name, round(_time.perf_counter() - _t0, 2))
for k, v in results.items():
    print(f"{'PASS' if v=='MATCH' or v.startswith('rows-only') else 'FAIL':4} {k}: {v} [{walls.get(k, -1.0)}s]")
n_bad = sum(1 for v in results.values() if not (v=='MATCH' or v.startswith('rows-only')))
print(f"== {len(results)-n_bad}/{len(results)} ok ==")


def _freshness_histogram():
    # Standing rotation check (VERDICT r7 #4): print the newest-driver-row
    # histogram so every harness run verifies the 5-round freshness-cycle
    # arithmetic automatically instead of by hand. The projection logic
    # (incl. the inter-round-window handling that uses the pre-written
    # NEXT_TIER, VERDICT r8 #3) lives in tools/freshness.py so it has a
    # liveness pin — tests/test_gate_liveness.py proves the warning
    # still fires on a genuinely stale rotation.
    import glob, os, re

    from decaton_spark.queries import NEXT_TIER
    from freshness import project

    newest = {}
    rounds = []
    for p in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        r = int(m.group(1))
        rounds.append(r)
        try:
            for k in json.load(open(p)):
                newest[k] = max(r, newest.get(k, 0))
        except (OSError, json.JSONDecodeError):
            print(f"freshness: skipping unreadable {os.path.basename(p)}")
    if not newest:
        return
    hist_line, proj_line, warning = project(
        newest, rounds, list(e.queries()), NEXT_TIER
    )
    print(hist_line)
    print(proj_line)
    if warning:
        print(warning)


_freshness_histogram()
sys.exit(1 if n_bad else 0)
