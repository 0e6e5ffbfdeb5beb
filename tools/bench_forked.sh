#!/usr/bin/env bash
# Forked bench: one fresh JVM per query, JMH-style.
#
# Why: r10 established that a single long-lived bench JVM deterministically
# degrades later queries (ext_semdedup 55.9 s after 12 unrelated heavy
# executions vs 10.6 s isolated, self-ratio 1.03 — i.e. NOT noise), even
# with per-query cache/persistent-RDD cleanup and a 1 GiB code cache.
# JIT/profile state is process-global and cannot be reset from inside the
# process; JMH forks per benchmark for exactly this reason. Cross-build
# comparisons stay valid either way (both builds see the same harness),
# but ABSOLUTE per-query receipts (the N-x scale curves) must come from
# forked runs.
#
# Usage: tools/bench_forked.sh <sf_dir> <out.json> <q1,q2,...>
# Env passthrough: SPARK_GRAFT_REPEATS (default 5), SPARK_GRAFT_HEAVY_EXTRA
# (default 4), SPARK_DRIVER_MEM, SPARK_CODE_CACHE, SPARK_GRAFT_CPUS.
# Requires `sbt compile` to have run (uses target/scala-2.13/classes).
set -euo pipefail
SF_DIR=$1; OUT=$2; QUERIES=$3
REPO=$(cd "$(dirname "$0")/.." && pwd)
# GRAFT_CLASSES: point at a classes SNAPSHOT (cp -r of target/scala-2.13/
# classes) so a long receipt run is immune to concurrent recompiles.
CLASSES="${GRAFT_CLASSES:-$REPO/target/scala-2.13/classes}"
[ -d "$CLASSES" ] || { echo "run sbt compile first" >&2; exit 1; }
CP="$CLASSES:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
IFS=',' read -ra QS <<< "$QUERIES"
for q in "${QS[@]}"; do
  echo "[bench_forked] $q ..." >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_QUERIES="$q" \
  SPARK_GRAFT_BENCH_OUT="$TMP/$q.artifact.json" \
  SPARK_GRAFT_REPEATS="${SPARK_GRAFT_REPEATS:-5}" \
  SPARK_GRAFT_HEAVY_EXTRA="${SPARK_GRAFT_HEAVY_EXTRA:-4}" \
  java -Xmx"${SPARK_DRIVER_MEM:-32g}" \
    -XX:ReservedCodeCacheSize="${SPARK_CODE_CACHE:-1g}" \
    $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench 2>"$TMP/$q.err" \
    | grep '"queries"' | tail -n 1 > "$TMP/$q.json" \
    || { echo "[bench_forked] $q FAILED:" >&2; tail -5 "$TMP/$q.err" >&2; exit 1; }
  # the FULL per-query JSON line (not the compact headline Bench now
  # prints last — that one has no "queries" map)
  [ -s "$TMP/$q.json" ] \
    || { echo "[bench_forked] $q produced no full JSON line" >&2; exit 1; }
done
python3 - "$SF_DIR" "$OUT" "$TMP" "${QS[@]}" <<'PY'
import json, sys
sf, out, tmp, qs = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:]
merged = {"metric": "total", "value": 0.0, "unit": "sec", "queries": {},
          "queries_median": {}, "queries_selfratio": {}, "forked": True,
          "method": "forked-per-query"}
reps = None; errors = []; loads = []
for q in qs:
    d = json.load(open(f"{tmp}/{q}.json"))
    merged["queries"].update(d["queries"])
    merged["queries_median"].update(d.get("queries_median", {}))
    merged["queries_selfratio"].update(d.get("queries_selfratio", {}))
    errors += d.get("errors", [])
    reps = d.get("repeats", reps)
    loads.append([d.get("load_avg_before"), d.get("load_avg_after")])
merged["value"] = sum(merged["queries"].values())
ratios = sorted(merged["queries_selfratio"].values())
if ratios:
    merged["noise"] = {"p50": ratios[len(ratios)//2],
                       "p90": ratios[min(len(ratios)-1, int(len(ratios)*0.9))],
                       "max": ratios[-1]}
merged.update({"repeats": reps, "heavy_extra":
               int(__import__("os").environ.get("SPARK_GRAFT_HEAVY_EXTRA", "4")),
               "errors": errors, "sf": sf, "per_query_loads": loads})
with open(out, "w") as f:
    json.dump(merged, f)
print(json.dumps({k: round(v, 2) for k, v in merged["queries"].items()}))
PY
echo "[bench_forked] wrote $OUT" >&2
