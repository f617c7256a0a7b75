#!/usr/bin/env bash
# sf1.0 correctness gate (r17 verdict ask #2): the scale where plans change
# (AQE skew splits, sort-fallbacks, memo reuse) is where perf is measured —
# this runs the DuckDB differential there for the heavy bench lane set and
# writes CORRECTNESS_sf1.json.
#
# Usage: tools/gate_sf1.sh [SF1_DIR]
#   SF1_DIR (default /tmp/sf1.0) is created via graft.ScaleUp if missing.
# Idempotent: golden TSVs (_sf10) are regenerated only when absent.
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${1:-/tmp/sf1.0}
LANES="q35_,q38_,t06_,t21_,t28_,t34_,t37_,t40_,v10_,c02_,c07_,g03_,g04_,g10_,g13_,g14_"
OUT=/tmp/verify_sf1

if [ ! -e "$SF1/customer.parquet" ]; then
  echo "[gate_sf1] synthesizing $SF1 via graft.ScaleUp"
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
    sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 $SF1 10"
fi

# independent Python golden derivations for the golden g-lanes (hours-scale
# is fine: pure-Python rederivation of 1.5M-read classification)
[ -f src/test/resources/golden/g03_classify_sf10.tsv ] || \
  python3 tools/golden_g03.py "$SF1" sf10
[ -f src/test/resources/golden/g10_multisample2_sf10.tsv ] || \
  python3 tools/golden_g04_g06_g08.py "$SF1" sf10
[ -f src/test/resources/golden/g13_wide64_freq_sf10.tsv ] || \
  python3 tools/golden_g13.py "$SF1" sf10
[ -f src/test/resources/golden/g14_xwide_sf10.tsv ] || \
  python3 tools/golden_g14.py "$SF1" sf10

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} SPARK_GRAFT_VERIFY_ONLY="$LANES" \
  sbt -batch "runMain graft.Verify $SF1 $OUT"

# ANN quality contracts at sf1.0 (r18 verdict ask #4): v04/v06/v07/v08/v10
# recall measured against exact brute force + planted near-dup twins, each
# with a named floor — merged into CORRECTNESS_sf1.json below. || true: a
# FAIL is folded into the artifact status, not a silent script abort.
ANN_JSON=/tmp/ann_recall_gate_sf1.json
# rm first: a stale file from a previous run must never be silently merged
# when this run's AnnRecallGate crashes before writing (r19 advice). The
# artifact writer below marks the gate FAILED if the file is absent after
# the run — the ANN lanes vanishing silently would misreport the r18-ask-#4
# contract as still measured.
rm -f "$ANN_JSON"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  sbt -batch "runMain graft.tools.AnnRecallGate $SF1 $ANN_JSON" || true

# host-speed canary (same JVM loop Bench stamps — graft.HostCanary), so a
# slow gate run is attributable to the host from the artifact alone
CANARY_LINE=$(sbt -batch "runMain graft.HostCanary" 2>/dev/null \
  | grep -o '{"canary_sec":[^}]*}' | head -1 || true)
CANARY=$(echo "$CANARY_LINE" | grep -o '"canary_sec":[0-9.]*' \
  | grep -o '[0-9.]*' | head -1)
CANARY=${CANARY:--1}
# memory-bandwidth axis (r20): shuffle lanes feel bus contention the ALU
# canary cannot see — stamp it so slow gate runs are attributable
CANARY_BW=$(echo "$CANARY_LINE" | grep -o '"canary_bw_gbps":[0-9.]*' \
  | grep -o '[0-9.]*$' | head -1)
CANARY_BW=${CANARY_BW:--1}

LOG=$(mktemp)
if python3 tools/check_oracle.py "$SF1" "$OUT" "$LANES" | tee "$LOG"; then
  STATUS=pass
else
  STATUS=fail
fi
python3 - "$LOG" "$STATUS" "$CANARY" "$ANN_JSON" "$CANARY_BW" <<'PYEOF'
import json, os, re, sys
log, status = open(sys.argv[1]).read(), sys.argv[2]
canary = float(sys.argv[3]) if len(sys.argv) > 3 else -1.0
ann_path = sys.argv[4] if len(sys.argv) > 4 else ""
canary_bw = float(sys.argv[5]) if len(sys.argv) > 5 else -1.0
rows = {}
for m in re.finditer(r"^(OK|FAIL)\s+(\S+?):?(?:[ \t]+\((\d+) rows\))?(?:[ \t]+(.*))?$", log, re.M):
    ok, name, n, note = m.groups()
    rows[name] = {"ok": ok == "OK", "rows": int(n) if n else None,
                  "golden": "[golden]" in (note or "")}
    # non-exact compare modes (e.g. t06's [lsh-recall m/n ...]) and FAIL
    # reasons travel into the artifact verbatim
    if (note or "").strip() and "[golden]" not in note:
        rows[name]["note"] = note.strip()
# ANN quality lanes: named measured contracts (planted-twin recall + broad
# recall@k vs exact brute force), never exact-or-nothing
if not (ann_path and os.path.exists(ann_path)):
    # the gate script rm'd the path before running AnnRecallGate, so an
    # absent file means the recall run crashed — fail loudly instead of
    # letting the ANN contract lanes silently vanish from the artifact
    rows["ann_recall_gate"] = {"ok": False, "rows": None, "golden": False,
                               "note": "AnnRecallGate produced no output "
                                       f"({ann_path} absent after run)"}
    status = "fail"
else:
    ann = json.load(open(ann_path))
    for name, r in ann.get("lanes", {}).items():
        rows[f"{name}_quality"] = {
            "ok": r["ok"], "rows": None, "golden": False,
            "note": (f"[ann-recall planted {r['planted_recall']}>="
                     f"{r['planted_floor']}, recall@{r['k']} "
                     f"{r['recall_at_k']}>={r['broad_floor']}] "
                     + r["contract"])}
        if not r["ok"]:
            status = "fail"
out = {"sf": "1.0", "lanes": rows,
       "ok": sum(1 for r in rows.values() if r["ok"]),
       "fail": sum(1 for r in rows.values() if not r["ok"]),
       "status": status, "canary_sec": canary, "canary_bw_gbps": canary_bw,
       "note": ("DuckDB differential at sf1.0 over the BENCH sf1 heavy-lane "
                "set; golden lanes pinned by _sf10 TSVs from the independent "
                "Python rederivations (tools/golden_*.py)")}
json.dump(out, open("CORRECTNESS_sf1.json", "w"), indent=1)
print("wrote CORRECTNESS_sf1.json:", out["ok"], "ok,", out["fail"], "fail")
sys.exit(0 if out["status"] == "pass" else 1)
PYEOF
