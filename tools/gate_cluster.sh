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

# --- CLI head-to-head at t1 scale (the r18 verdict's second cluster ask):
# build + classify on the reference's shipped test data (the
# ReferenceHeadToHeadGoldenSpec inputs), single-JVM vs local-cluster —
# per-read kraken lines must be byte-identical. Classify runs BOTH paths:
# the auto in-memory broadcast table (ships the LongTaxonMap to executor
# JVMs) and the forced bucketed join. Skipped via SPARK_GRAFT_SKIP_T1=1.
CLI_T1="skipped"
if [ "${SPARK_GRAFT_SKIP_T1:-0}" != "1" ]; then
  T1=/tmp/cluster_t1
  rm -rf "$T1"; mkdir -p "$T1/tax"
  python3 - "$T1" <<'PY'
import sys
t1 = sys.argv[1]
hdrs = [l[1:].split()[0] for l in
        open('/root/reference/testData/SRR094926_10k.fasta')
        if l.startswith('>')]
with open(f'{t1}/labels.tsv', 'w') as f:
    for i, h in enumerate(hdrs):
        f.write(f"{h}\t{455631 if i % 2 == 0 else 526997}\n")
    f.write("chr1H\t9606\n")
with open(f'{t1}/tax/nodes.dmp', 'w') as f:
    f.write("1\t|\t1\t|\tno rank\t|\n455631\t|\t1\t|\tstrain\t|\n"
            "526997\t|\t1\t|\tstrain\t|\n9606\t|\t1\t|\tspecies\t|\n")
with open(f'{t1}/tax/names.dmp', 'w') as f:
    f.write("1\t|\troot\t|\t\t|\tscientific name\t|\n"
            "455631\t|\tClostridioides difficile QCD-66c26\t|\t\t|\t"
            "scientific name\t|\n"
            "526997\t|\tBacillus mycoides DSM 2048\t|\t\t|\t"
            "scientific name\t|\n"
            "9606\t|\tHomo sapiens\t|\t\t|\tscientific name\t|\n")
PY
  cat /root/reference/testData/SRR094926_10k.fasta \
      /root/reference/testData/Akashinriki_10k.fasta > "$T1/lib.fasta"
  run_t1() { # $1 master ('' = default local), $2 tag
    SPARK_MASTER=$1 sbt -batch "runMain graft.Main build --k 35 --m 31 --s 7 \
      --p 16 --library $T1/lib.fasta --labels $T1/labels.tsv \
      --taxonomy $T1/tax --output $T1/idx_$2" \
      > "$T1/build_$2.log" 2>&1
    SPARK_MASTER=$1 sbt -batch "runMain graft.Main classify \
      --index $T1/idx_$2 --p 16 \
      --reads /root/reference/testData/ERR599052_10k.fastq \
      --output $T1/out_$2" > "$T1/classify_$2.log" 2>&1
    find "$T1/out_$2" -name '*.gz' -exec zcat {} + | sort \
      > "$T1/kraken_$2.txt"
    SPARK_MASTER=$1 sbt -batch "runMain graft.Main classify \
      --index $T1/idx_$2 --p 16 --in-memory false \
      --reads /root/reference/testData/ERR599052_10k.fastq \
      --output $T1/outbj_$2" > "$T1/classifybj_$2.log" 2>&1
    find "$T1/outbj_$2" -name '*.gz' -exec zcat {} + | sort \
      > "$T1/krakenbj_$2.txt"
  }
  run_t1 "" local
  run_t1 "$MASTER" cluster
  if cmp -s "$T1/kraken_local.txt" "$T1/kraken_cluster.txt" \
      && cmp -s "$T1/krakenbj_local.txt" "$T1/krakenbj_cluster.txt" \
      && [ -s "$T1/kraken_local.txt" ]; then
    CLI_T1="identical:$(wc -l < "$T1/kraken_local.txt")"
  else
    CLI_T1="MISMATCH"
  fi
  echo "[gate_cluster] t1 CLI head-to-head: $CLI_T1"
fi

# host-speed canary (same JVM loop Bench stamps — graft.HostCanary).
# head -1: sbt can echo the JSON line more than once (stdout + log replay);
# a multi-line value would crash float() in the artifact writer AFTER all
# the expensive gate work ran (r19 post-mortem).
CANARY_LINE=$(sbt -batch "runMain graft.HostCanary" 2>/dev/null \
  | grep -o '{"canary_sec":[^}]*}' | head -1 || true)
CANARY=$(echo "$CANARY_LINE" | grep -o '"canary_sec":[0-9.]*' \
  | grep -o '[0-9.]*' | head -1)
CANARY=${CANARY:--1}
# memory-bandwidth axis (r20): see gate_sf1.sh
CANARY_BW=$(echo "$CANARY_LINE" | grep -o '"canary_bw_gbps":[0-9.]*' \
  | grep -o '[0-9.]*$' | head -1)
CANARY_BW=${CANARY_BW:--1}

LOG=$(mktemp)
if python3 tools/check_oracle.py "$SF" "$OUT" "$LANES" | tee "$LOG"; then
  STATUS=pass
else
  STATUS=fail
fi
# artifact name override (r20: the sf0.1 heavy-lane re-run writes its own
# file instead of clobbering the full-114-lane sf0.01 artifact)
OUT_JSON=${SPARK_GRAFT_CLUSTER_JSON:-CORRECTNESS_cluster.json}
python3 - "$LOG" "$STATUS" "$MASTER" "$SF" "$CANARY" "$CLI_T1" "$OUT_JSON" "$CANARY_BW" <<'PYEOF'
import json, re, sys
log, status, master, sf = open(sys.argv[1]).read(), *sys.argv[2:5]
canary = float(sys.argv[5]) if len(sys.argv) > 5 else -1.0
cli_t1 = sys.argv[6] if len(sys.argv) > 6 else "skipped"
out_json = sys.argv[7] if len(sys.argv) > 7 else "CORRECTNESS_cluster.json"
canary_bw = float(sys.argv[8]) if len(sys.argv) > 8 else -1.0
if cli_t1 == "MISMATCH":
    status = "fail"
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
       "status": status, "canary_sec": canary, "canary_bw_gbps": canary_bw,
       "cli_t1_headtohead": cli_t1,
       "cli_t1_note": ("build+classify on the reference's shipped test "
                       "data (348,619-record index, 10,000 reads), "
                       "single-JVM vs local-cluster, per-read kraken "
                       "lines compared byte-for-byte on BOTH classify "
                       "paths (broadcast in-memory table AND bucketed "
                       "join)"),
       "note": ("DuckDB differential with Verify run under a real "
                "local-cluster (separate executor JVMs forked from "
                "SPARK_HOME by 2 standalone workers): aggregate-buffer "
                "serialize/merge, broadcast shipping, and closure "
                "serialization all cross process boundaries here")}
json.dump(out, open(out_json, "w"), indent=1)
print(f"wrote {out_json}:", out["ok"], "ok,", out["fail"], "fail")
sys.exit(0 if out["status"] == "pass" else 1)
PYEOF
