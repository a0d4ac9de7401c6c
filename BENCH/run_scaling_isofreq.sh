#!/usr/bin/env bash
# Iso-frequency variant of the two-cluster-size scaling gate.
#
# WHY THIS EXISTS: on this (shared, virtualized) box the CPU clock rises when
# few vCPUs are busy, so a local[N] run enjoys a deeper turbo than the
# local[4N] run — the throughput RATIO then under-reports software scaling
# (BENCH/BASELINE.md "Why N=2", and the round-2 dedup forensics: a raw CPU
# probe ceilinged at 0.88 for 2→16 workers on an idle box). On the actual
# deployment target — a multi-executor cluster — per-node frequency state is
# IDENTICAL at N and 4N executors, because each node runs the same number of
# busy cores either way. This script recreates that property locally:
#
#   * the Spark job is pinned (taskset) to vCPUs [0, cores) in both runs;
#   * during the SMALL run, (4N - N) pure-CPU spinner processes are pinned to
#     vCPUs [N, 4N), so the TOTAL number of busy vCPUs is 4N in both runs and
#     the frequency governor sees the same load either way. The spinners are
#     integer-only (no memory traffic), so they do not consume the memory
#     bandwidth the measured job needs.
#
# Both the raw gate (run_scaling.sh) and this iso-frequency number are
# reported in BENCH/BASELINE.md; neither is hidden behind the other.
#
# Usage: BENCH/run_scaling_isofreq.sh [N] [FILES] [MODE]
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:-2}"
N4=$((N * 4))
FILES="${2:-40000}"
MODE="${3:-dedup}"
WORK="$(mktemp -d /tmp/kg_scaling_iso.XXXXXX)"
ZIP="$WORK/raptor_spark.zip"
CORPUS="$WORK/corpus"
BALLAST_PIDS=()
cleanup() {
  for p in "${BALLAST_PIDS[@]:-}"; do kill "$p" 2>/dev/null || true; done
  rm -rf "$WORK"
}
trap cleanup EXIT

python - "$ZIP" <<'EOF'
import sys, zipfile, pathlib
zip_path = sys.argv[1]
root = pathlib.Path("raptor_spark")
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print(f"packaged {zip_path}")
EOF

SUBMIT_CONF=(
  --conf spark.sql.adaptive.enabled=true
  --conf spark.sql.adaptive.skewJoin.enabled=true
  --conf spark.sql.execution.arrow.pyspark.enabled=true
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048
  --conf spark.sql.session.timeZone=UTC
  --conf spark.locality.wait=0
  --conf spark.driver.memory=8g
  --conf spark.ui.enabled=false
)

echo "== generating corpus ($FILES files) ==" >&2
spark-submit --master "local[$N4]" "${SUBMIT_CONF[@]}" \
  --py-files "$ZIP" BENCH/gen_corpus.py --files "$FILES" --output "$CORPUS" >&2

start_ballast() {
  local first="$1" last="$2"
  for c in $(seq "$first" "$last"); do
    taskset -c "$c" python -c '
while True:
    x = 1
    for i in range(1 << 22):
        x = (x * 1103515245 + 12345) & 0x7fffffff
' &
    BALLAST_PIDS+=("$!")
  done
}

stop_ballast() {
  for p in "${BALLAST_PIDS[@]:-}"; do kill "$p" 2>/dev/null || true; done
  BALLAST_PIDS=()
  sleep 1
}

run_one() {
  local cores="$1"
  taskset -c "0-$((cores - 1))" \
    spark-submit --master "local[$cores]" "${SUBMIT_CONF[@]}" \
    --conf "spark.sql.shuffle.partitions=$((2 * cores))" \
    --py-files "$ZIP" BENCH/scaling_job.py --input "$CORPUS" --mode "$MODE" \
    2>"$WORK/stderr_$cores.log" | tail -1
}

LOAD_PRE="$(cut -d' ' -f1 /proc/loadavg)"
echo "== local[$N] run with $((N4 - N)) ballast spinners on vCPUs $N-$((N4 - 1)) ==" >&2
start_ballast "$N" "$((N4 - 1))"
R1="$(run_one "$N")"
stop_ballast
echo "$R1" >&2
echo "== local[$N4] run (no ballast — $N4 busy vCPUs either way) ==" >&2
R2="$(run_one "$N4")"
echo "$R2" >&2

SCALING_MODE="$MODE" python - "$R1" "$R2" "$N" "$N4" "$LOAD_PRE" <<'EOF'
import json, sys, os
r1, r2 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
n, n4 = int(sys.argv[3]), int(sys.argv[4])
eff = (r2["files_per_sec"] / r1["files_per_sec"]) / (n4 / n)
mode = os.environ.get("SCALING_MODE", "dedup")
print(json.dumps({
    "metric": f"{mode}_scaling_isofreq",
    "n_cores": n, "n4_cores": n4,
    "files": r1["files"], "triples": r1["triples"],
    "files_per_sec_n": r1["files_per_sec"],
    "files_per_sec_4n": r2["files_per_sec"],
    "wall_sec_n": r1["wall_sec"], "wall_sec_4n": r2["wall_sec"],
    "scaling_efficiency": round(eff, 3),
    "pass": eff >= 0.8,
    "loadavg_1m_pre": float(sys.argv[5]),
    "method": "iso-frequency: total busy vCPUs pinned equal in both runs",
}))
EOF
