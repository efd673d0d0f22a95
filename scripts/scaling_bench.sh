#!/usr/bin/env bash
# Scaling-efficiency evidence (BASELINE.json north rule: ≥0.8 from N to 4N).
#
# No real cluster exists in this sandbox, so the two-cluster-size criterion is
# evidenced by running the SAME spark-submit job on the SAME deterministic
# input at local[8] and local[32] (N and 4N cores) in separate JVMs, and
# reporting tokens/sec at both plus efficiency = (tp_32 / tp_8) / 4.
#
# Usage: scripts/scaling_bench.sh [ROWS]   (writes BENCH/BASELINE.md)
set -euo pipefail
cd "$(dirname "$0")/.."

ROWS="${1:-150000}"
WORK=$(mktemp -d /tmp/scaling_bench.XXXX)
zip -qr "$WORK/engine.zip" pandora_apache_avro_idl_to_apache_parquet_spark -x '*__pycache__*'

run_once() { # cores attempt
  local cores=$1 out="$WORK/enc_$1_$2"
  rm -rf "$out"
  spark-submit --master "local[$cores]" \
    --conf spark.sql.shuffle.partitions="$cores" \
    --conf spark.driver.memory=8g \
    --conf spark.ui.enabled=false \
    --py-files "$WORK/engine.zip" jobs/encode_job.py \
    --synth "$ROWS" --out "$out" --n-parts 96 2>"$WORK/err_$cores.log" | tail -1
}

run() { # cores -> best of 2 by tokens_per_sec (JIT/page-cache variance on a
        # shared sandbox VM is large; best-of-N is the standard mitigation)
  local a b
  a=$(run_once "$1" a); b=$(run_once "$1" b)
  python -c "
import json,sys
r=[json.loads(sys.argv[1]),json.loads(sys.argv[2])]
print(json.dumps(max(r,key=lambda x:x['tokens_per_sec'])))" "$a" "$b"
}

echo "running local[8]..." >&2
J8=$(run 8)
echo "running local[32]..." >&2
J32=$(run 32)

python - "$J8" "$J32" "$ROWS" <<'EOF'
import json, sys, datetime
j8, j32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
rows = int(sys.argv[3])
tp8, tp32 = j8["tokens_per_sec"], j32["tokens_per_sec"]
eff = (tp32 / tp8) / 4
md = f"""# BENCH/BASELINE — scaling-efficiency evidence

North rule: throughput scaling efficiency >= 0.8 going from N to 4N executors.
Sandbox protocol (no real cluster): identical spark-submit encode job, identical
deterministic input ({rows} rows, seed 42), separate JVMs at local[8] vs
local[32], best of 2 runs per config (shared-VM variance); measured
{datetime.date.today()}.

| config | tokens | encode sec | tokens/sec | bytes/token |
|---|---|---|---|---|
| local[8]  (N)  | {j8['n_tokens']:,} | {j8['encode_sec']} | {tp8:,} | {j8['bytes_per_token']} |
| local[32] (4N) | {j32['n_tokens']:,} | {j32['encode_sec']} | {tp32:,} | {j32['bytes_per_token']} |

**Scaling efficiency (tp_4N / tp_N) / 4 = {eff:.3f}** (target >= 0.8)

Command: `spark-submit --master local[{{8,32}}] --py-files engine.zip
jobs/encode_job.py --synth {rows} --out <dir> --n-parts 96`

Caveat: both runs share one machine, so 4N at local[32] competes for memory
bandwidth that a real 4N-executor cluster would not; the efficiency number
here is therefore a lower bound on cluster scaling for this shuffle-light
(single exchange) plan.
"""
open("BENCH/BASELINE.md", "w").write(md)
print(md)
EOF
rm -rf "$WORK"
