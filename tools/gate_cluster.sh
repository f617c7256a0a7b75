#!/usr/bin/env bash
# Cross-JVM correctness gate (r18 verdict ask #1): every prior verification
# ran in ONE JVM (local[N]), so CollectAligned/LcaAggregate buffer
# serialization, broadcast taxonomy + InMemoryClassifier table shipping, and
# mapPartitions closure cleanliness never crossed a real executor process
# boundary. This runs the FULL 114-lane Verify dump under
# local-cluster[2,8,4096] — a real standalone master + 2 workers, each
# forking a separate executor JVM from SPARK_HOME — then the same DuckDB
# differential, and writes CORRECTNESS_cluster.json.
#
# Usage: tools/gate_cluster.sh [SF_DIR] [LANES]
#   SF_DIR default /root/testdata/sf0.01 (the driver's own oracle scale)
#   LANES  default empty = all lanes
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
LANES=${2:-}
OUT=/tmp/verify_cluster
MASTER=${SPARK_GRAFT_MASTER:-local-cluster[2,8,4096]}

# The standalone Worker builds the executor command via the SPARK_HOME
# launcher, which needs SPARK_SCALA_VERSION when not started by spark-class
# (load-spark-env.sh normally exports it).
export SPARK_SCALA_VERSION=2.13

SPARK_GRAFT_MASTER="$MASTER" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  SPARK_GRAFT_VERIFY_ONLY="$LANES" \
  sbt -batch "runMain graft.Verify $SF $OUT"

# host-speed canary (same JVM loop Bench stamps — graft.HostCanary)
CANARY=$(sbt -batch "runMain graft.HostCanary" 2>/dev/null \
  | grep -o '{"canary_sec":[0-9.]*}' | grep -o '[0-9.]*' || echo -1)

LOG=$(mktemp)
if python3 tools/check_oracle.py "$SF" "$OUT" "$LANES" | tee "$LOG"; then
  STATUS=pass
else
  STATUS=fail
fi
python3 - "$LOG" "$STATUS" "$MASTER" "$SF" "$CANARY" <<'PYEOF'
import json, re, sys
log, status, master, sf = open(sys.argv[1]).read(), *sys.argv[2:5]
canary = float(sys.argv[5]) if len(sys.argv) > 5 else -1.0
rows = {}
for m in re.finditer(r"^(OK|FAIL)\s+(\S+?):?(?:[ \t]+\((\d+) rows\))?(?:[ \t]+(.*))?$", log, re.M):
    ok, name, n, note = m.groups()
    rows[name] = {"ok": ok == "OK", "rows": int(n) if n else None,
                  "golden": "[golden]" in (note or "")}
    if (note or "").strip() and "[golden]" not in note:
        rows[name]["note"] = note.strip()
out = {"master": master, "sf_dir": sf, "lanes": rows,
       "ok": sum(1 for r in rows.values() if r["ok"]),
       "fail": sum(1 for r in rows.values() if not r["ok"]),
       "status": status, "canary_sec": canary,
       "note": ("DuckDB differential with Verify run under a real "
                "local-cluster (separate executor JVMs forked from "
                "SPARK_HOME by 2 standalone workers): aggregate-buffer "
                "serialize/merge, broadcast shipping, and closure "
                "serialization all cross process boundaries here")}
json.dump(out, open("CORRECTNESS_cluster.json", "w"), indent=1)
print("wrote CORRECTNESS_cluster.json:", out["ok"], "ok,", out["fail"], "fail")
PYEOF
[ "$STATUS" = pass ]
