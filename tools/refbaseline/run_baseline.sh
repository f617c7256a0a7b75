#!/bin/bash
# Measured head-to-head: the reference engine (Slacken, compiled from
# /root/reference sources) vs graft, on IDENTICAL inputs derived only from
# the reference's own shipped test data, same JVM, same Spark jars, same
# master (local[32]), same shuffle-partition/bucket count (32), same
# k/m/spaces (35/31/7 — the reference build command's own defaults).
#
# The reference's two unavailable dependencies (org.rogach:scallop CLI
# parser, it.unimi.dsi:fastutil) are shimmed with the minimal
# public-API-compatible implementations in tools/refbaseline/shim/ (this
# sandbox has no network, so the real artifacts cannot be resolved), and
# two imports are rewritten for the Scala 2.13 / Spark 4 toolchain both
# engines share (scala-collection-compat no-ops on 2.13; one
# spark.sqlContext.implicits -> spark.implicits). Nothing about the
# reference's algorithms or plans is modified.
#
# Stages timed (full CLI wall clock per run, JVM + session startup
# included on both sides — both pay the same ~10 s floor):
#   build:    genome library + taxonomy -> minimizer-LCA index on disk
#   classify: fastq reads -> per-read classifications + kraken report
# Tiers:
#   t1: shipped data verbatim (SRR094926_10k.fasta + Akashinriki_10k.fasta
#       as the 3-taxon library; ERR599052_10k.fastq as reads)
#   t2: the same data replicated REP_FACTOR x with fresh sequence ids
#       (library) / repeated records (reads) — identical files, both engines
# Output: /tmp/refbench/out/headtohead.json (+ per-run logs)
set -euo pipefail

REPO=${REPO:-/root/repo}
REF=${REF:-/root/reference}
WORK=${WORK:-/tmp/refbench}
BUILD=${BUILD:-/tmp/refbuild}
REPS=${REPS:-3}
REP_FACTOR=${REP_FACTOR:-64}
HEAP=${HEAP:-20g}
CPUS=${CPUS:-32}
BUCKETS=${BUCKETS:-32}

SPARKCP=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
# Scala toolchain jars: take SCALA_JARS (colon-separated) if set, else
# discover them by name anywhere under the local coursier cache — no
# assumption about which repository the cache was populated from.
SCALA_VER=${SCALA_VER:-2.13.17}
find_scala_jar() {
  find "${COURSIER_CACHE:-$HOME/.cache/coursier}" -name "$1" 2>/dev/null | head -1
}
if [ -n "${SCALA_JARS:-}" ]; then
  CPJ="$SCALA_JARS"
else
  CPJ="$(find_scala_jar scala-compiler-$SCALA_VER.jar):$(find_scala_jar scala-reflect-$SCALA_VER.jar):$(find_scala_jar scala-library-$SCALA_VER.jar)"
  if [ "${CPJ//:/}" = "" ]; then
    echo "scala $SCALA_VER jars not found in ${COURSIER_CACHE:-$HOME/.cache/coursier}; set SCALA_JARS=compiler.jar:reflect.jar:library.jar" >&2
    exit 1
  fi
fi

JVM_FLAGS=(
  -Xmx$HEAP
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
  -Djdk.reflect.useDirectMethodHandleAccessor=false
  -Dspark.master=local[$CPUS]
  -Dspark.ui.enabled=false
  -Dspark.sql.shuffle.partitions=$BUCKETS
  -Dlog4j2.level=warn
)

# ---------------------------------------------------------------- compile
compile_reference() {
  echo "[refbaseline] compiling reference at $BUILD"
  rm -rf "$BUILD"
  mkdir -p "$BUILD/classes" "$BUILD/jsrc/com/jnpersson/fastdoop"
  cp -r "$REF/src/main/scala" "$BUILD/srcs"
  cp "$REF/src/main/java/com/jnpersson/fastdoop/PartialSequence.java" \
    "$BUILD/jsrc/com/jnpersson/fastdoop/"
  cp "$REPO"/tools/refbaseline/shim/*.scala "$BUILD/"
  # Scala 2.13 / Spark 4 toolchain compat (both engines share it):
  # scala-collection-compat is an empty façade on 2.13, and
  # spark.sqlContext stopped being a stable import path in Spark 4.
  sed -i 's/^import scala.collection.compat.immutable.ArraySeq$/import scala.collection.immutable.ArraySeq/' \
    "$BUILD/srcs/com/jnpersson/kmers/SplitterFormat.scala"
  sed -i '/^import scala.collection.compat._$/d' \
    "$BUILD/srcs/com/jnpersson/slacken/BrackenWeights.scala" \
    "$BUILD/srcs/com/jnpersson/kmers/input/FileInputs.scala"
  sed -i 's/import spark.sqlContext.implicits._/import spark.implicits._/' \
    "$BUILD/srcs/com/jnpersson/slacken/Minimizers.scala"
  # Spark 4 names a UDF-of-aliased-column output "UDF(array(id1) AS
  # minimizer)" instead of resolving the inner alias, so the reference's
  # respace (KeyValueIndex.scala:376) can no longer look the column up by
  # name — restore the name with an explicit outer alias (no algorithm
  # change; respace crashes with UNRESOLVED_COLUMN without this).
  sed -i 's/records.select(applySpaceUdf(minimizerColumnFromIdColumns), \$"taxon")/records.select(applySpaceUdf(minimizerColumnFromIdColumns).as("minimizer"), \$"taxon")/' \
    "$BUILD/srcs/com/jnpersson/slacken/KeyValueIndex.scala"
  (cd "$BUILD" &&
    javac -d classes -cp "$SPARKCP" jsrc/com/jnpersson/fastdoop/PartialSequence.java &&
    java -cp "$CPJ" scala.tools.nsc.Main -classpath "$SPARKCP:classes" \
      -d classes -release 17 \
      $(find srcs -name '*.scala') fastutil.scala scallop.scala globalmentor.scala)
  echo "[refbaseline] reference compiled"
}

# ------------------------------------------------------------------- data
gen_data() {
  echo "[refbaseline] generating shared inputs at $WORK/data"
  rm -rf "$WORK"
  mkdir -p "$WORK/data/taxonomy" "$WORK/data/t1/lib/library" \
    "$WORK/data/t2/lib/library" "$WORK/out" "$WORK/scratch_ref" \
    "$WORK/scratch_graft"

  # Tiny taxonomy matching the reference's own hardcoded test taxonomy
  # (reference src/test .../Testing.scala TestData.taxonomy): two strains
  # and one species, all direct children of root.
  cat > "$WORK/data/taxonomy/nodes.dmp" <<'EOF'
1	|	1	|	no rank	|
455631	|	1	|	strain	|
526997	|	1	|	strain	|
9606	|	1	|	species	|
EOF
  cat > "$WORK/data/taxonomy/names.dmp" <<'EOF'
1	|	root	|		|	scientific name	|
455631	|	Clostridioides difficile QCD-66c26	|		|	scientific name	|
526997	|	Bacillus mycoides DSM 2048	|		|	scientific name	|
9606	|	Homo sapiens	|		|	scientific name	|
EOF
  : > "$WORK/data/taxonomy/merged.dmp"

  # t1 library: every shipped sequence, labels derived deterministically —
  # Akashinriki chr1H -> 9606, SRR reads alternate 455631/526997.
  cat "$REF/testData/SRR094926_10k.fasta" "$REF/testData/Akashinriki_10k.fasta" \
    > "$WORK/data/t1/lib/library/genomes.fna"
  awk '/^>/{
    split(substr($0,2), h, " ");
    if (h[1] == "chr1H") t = 9606; else { t = (n % 2 == 0) ? 455631 : 526997; n++ }
    print h[1] "\t" t
  }' "$WORK/data/t1/lib/library/genomes.fna" > "$WORK/data/t1/lib/seqid2taxid.map"
  cp "$REF/testData/ERR599052_10k.fastq" "$WORK/data/t1/reads.fastq"

  # t2: REP_FACTOR x replication. Library copies get fresh sequence ids
  # (suffix _rN) so every copy contributes records; reads replicate as-is
  # (classification treats records independently).
  for ((r = 0; r < REP_FACTOR; r++)); do
    awk -v r=$r '/^>/{ split(substr($0,2), h, " "); print ">" h[1] "_r" r; next } { print }' \
      "$WORK/data/t1/lib/library/genomes.fna"
  done > "$WORK/data/t2/lib/library/genomes.fna"
  for ((r = 0; r < REP_FACTOR; r++)); do
    awk -v r=$r '{ print $1 "_r" r "\t" $2 }' "$WORK/data/t1/lib/seqid2taxid.map"
  done > "$WORK/data/t2/lib/seqid2taxid.map"
  # reads replicate with UNIQUE titles per copy (suffix _rN on the @ line):
  # kraken-style classification keys reads by title, so verbatim duplicates
  # would collapse into one logical read with N-fold hit multiplicity on
  # the per-title regroup — a different computation, not 64x the data
  for ((r = 0; r < REP_FACTOR; r++)); do
    awk -v r=$r 'NR % 4 == 1 { split($0, h, " "); print h[1] "_r" r; next } { print }' \
      "$WORK/data/t1/reads.fastq"
  done > "$WORK/data/t2/reads.fastq"
  du -sh "$WORK"/data/t*/lib/library/genomes.fna "$WORK"/data/t*/reads.fastq
}

# t3: the classify2 (two-step dynamic classification) tier. Same t2-scale
# data, but under a HIERARCHICAL taxonomy (strains under species under a
# genus) — the shipped flat taxonomy has no species ancestor for the two
# strains, so species-rank taxon selection would be degenerate there.
# With -R 100 (the reference classify2 default) the expected selection is
# exactly one species clade: cdiff gets ~192 first-pass reads (>= 100),
# human 64 (< 100), bmyc 0 — so the second pass MUST drop the human reads
# that the static pass classified. A real selection, not a no-op.
gen_data_t3() {
  echo "[refbaseline] generating t3 (classify2) inputs"
  local D=$WORK/data/t3
  mkdir -p "$D/taxonomy" "$D/lib"
  cat > "$D/taxonomy/nodes.dmp" <<'EOF'
1	|	1	|	no rank	|
100	|	1	|	genus	|
200	|	100	|	species	|
300	|	100	|	species	|
455631	|	200	|	strain	|
526997	|	300	|	strain	|
9606	|	1	|	species	|
EOF
  cat > "$D/taxonomy/names.dmp" <<'EOF'
1	|	root	|		|	scientific name	|
100	|	genus one	|		|	scientific name	|
200	|	Clostridioides difficile	|		|	scientific name	|
300	|	Bacillus mycoides	|		|	scientific name	|
455631	|	Clostridioides difficile QCD-66c26	|		|	scientific name	|
526997	|	Bacillus mycoides DSM 2048	|		|	scientific name	|
9606	|	Homo sapiens	|		|	scientific name	|
EOF
  : > "$D/taxonomy/merged.dmp"
  cp -r "$WORK/data/t2/lib/library" "$D/lib/library"
  cp "$WORK/data/t2/lib/seqid2taxid.map" "$D/lib/seqid2taxid.map"
  cp "$WORK/data/t2/reads.fastq" "$D/reads.fastq"
}

# Two-step dynamic classification head-to-head. Builds a t3 index per
# engine (timed), then REPS_C2 reps of classify2 on identical inputs with
# identical parameters: reads-criterion threshold 100, init confidence 0.0,
# rank species, final confidence 0.0, min hit groups 2.
classify2_stage() {
  gen_data_t3
  local D=$WORK/data/t3
  declare -A C2TIMES
  for rep in $(seq 1 ${REPS_C2:-3}); do
    for eng in ref graft; do
      rm -rf "$WORK/idx_${eng}_t3" "$WORK/out2_${eng}_t3"* \
        "$WORK/scratch_$eng" && mkdir -p "$WORK/scratch_$eng"
      if [[ $eng == ref ]]; then
        b=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_t3_build_$rep.log" \
          build -k 35 -m 31 --spaces 7 \
          --taxonomy "$D/taxonomy" --library "$D/lib" \
          --index "$WORK/idx_ref_t3")
        c=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_t3_classify2_$rep.log" \
          classify2 --index "$WORK/idx_ref_t3" --library "$D/lib" \
          --reads ${R_THRESH:-100} --init-confidence 0.0 --rank species \
          --output "$WORK/out2_ref_t3" "$D/reads.fastq")
      else
        b=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_t3_build_$rep.log" \
          build -k 35 -m 31 -s 7 --taxonomy "$D/taxonomy" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_t3")
        c=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_t3_classify2_$rep.log" \
          classify2 --index "$WORK/idx_graft_t3" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" \
          --reads "$D/reads.fastq" --criterion reads --threshold ${R_THRESH:-100} \
          --init-confidence 0.0 --rank species \
          --output "$WORK/out2_graft_t3")
      fi
      C2TIMES[${eng}_t3_build_$rep]=$b
      C2TIMES[${eng}_t3_classify2_$rep]=$c
      echo "[refbaseline] $eng t3 rep$rep: build=${b}s classify2=${c}s"
    done
  done

  # correctness: per-read decisions and (descendant-expanded) taxon sets
  python3 "$REPO/tools/refbaseline/compare_classify2.py" \
    "$D/taxonomy/nodes.dmp" \
    "$WORK/out2_ref_t3_c0.0" "$WORK/out2_ref_t3_taxonSet.txt" \
    "$WORK/out2_graft_t3" "$WORK/out2_graft_t3_taxonSet.txt" \
    | tee "$WORK/out/classify2_compare.txt"

  {
    echo -n '{"stage":"classify2","reps":'${REPS_C2:-3}',"rep_factor":'$REP_FACTOR',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7,R='${R_THRESH:-100}',init_conf=0.0,rank=species"'
    for key in "${!C2TIMES[@]}"; do echo -n ",\"$key\":${C2TIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_classify2.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_classify2.json"
  cat "$WORK/out/headtohead_classify2.json"
}

# Bracken-weights head-to-head (reference `bracken-build` vs graft
# `bracken`) on the t1 library at read length 100. Each engine's own CLI
# default path (the reference CLI hardcodes gradual=true; graft's default
# is its direct path — both are what a user gets). Output normalized by
# compare_bracken.py: (dest, source, read-count) triples must be identical.
bracken_stage() {
  # Dedicated 10-taxon tier: the reference's bracken-build crashes on
  # taxon sets smaller than 5 (BrackenWeights.scala:366 chunks the set
  # with grouped(taxa.size / 5) — integer-zero for size < 5 throws
  # "size=0 and step=0"). A genuine reference defect on tiny libraries;
  # 10 taxa keeps it on its intended path. Same genomes as t1, labels
  # spread across 10 species under root.
  local D=$WORK/data/bk
  mkdir -p "$D/taxonomy" "$D/lib"
  {
    printf '1\t|\t1\t|\tno rank\t|\n'
    for i in $(seq 101 110); do printf '%s\t|\t1\t|\tspecies\t|\n' $i; done
  } > "$D/taxonomy/nodes.dmp"
  {
    printf '1\t|\troot\t|\t\t|\tscientific name\t|\n'
    for i in $(seq 101 110); do
      printf '%s\t|\tspecies %s\t|\t\t|\tscientific name\t|\n' $i $i
    done
  } > "$D/taxonomy/names.dmp"
  : > "$D/taxonomy/merged.dmp"
  cp -r "$WORK/data/t1/lib/library" "$D/lib/library"
  awk '/^>/{
    split(substr($0,2), h, " ");
    if (h[1] == "chr1H") t = 110; else { t = 101 + (n % 9); n++ }
    print h[1] "\t" t
  }' "$D/lib/library/genomes.fna" > "$D/lib/seqid2taxid.map"

  declare -A BKTIMES
  for rep in $(seq 1 ${REPS_BK:-3}); do
    for eng in ref graft; do
      rm -rf "$WORK/idx_${eng}_bk"* "$WORK/bk_${eng}"* "$WORK/scratch_$eng" \
        && mkdir -p "$WORK/scratch_$eng"
      if [[ $eng == ref ]]; then
        b=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_bk_build_$rep.log" \
          build -k 35 -m 31 --spaces 7 \
          --taxonomy "$D/taxonomy" --library "$D/lib" \
          --index "$WORK/idx_ref_bk")
        w=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_bk_weights_$rep.log" \
          bracken-build --index "$WORK/idx_ref_bk" --library "$D/lib" \
          --read-len 100)
      else
        b=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_bk_build_$rep.log" \
          build -k 35 -m 31 -s 7 --taxonomy "$D/taxonomy" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_bk")
        w=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_bk_weights_$rep.log" \
          bracken --index "$WORK/idx_graft_bk" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" \
          --read-len 100 --output "$WORK/bk_graft")
      fi
      BKTIMES[${eng}_bk_build_$rep]=$b
      BKTIMES[${eng}_bk_weights_$rep]=$w
      echo "[refbaseline] $eng bracken rep$rep: build=${b}s weights=${w}s"
    done
  done

  python3 "$REPO/tools/refbaseline/compare_bracken.py" \
    "$WORK/idx_ref_bk_bracken/database100mers.kmer_distrib" \
    "$WORK/bk_graft" | tee "$WORK/out/bracken_compare.txt"

  {
    echo -n '{"stage":"bracken","reps":'${REPS_BK:-3}',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7,readLen=100"'
    for key in "${!BKTIMES[@]}"; do echo -n ",\"$key\":${BKTIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_bracken.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_bracken.json"
  cat "$WORK/out/headtohead_bracken.json"
}

# Paired-end classification head-to-head. Mate pairs derived from the
# shipped reads: each t2 read splits into R1 = first half, R2 = second
# half, titles suffixed /1 and /2 (both engines must strip the suffix to
# join mates; the reference joins by header — InputReader.scala:104-120 —
# and classifies R1 + mate border + R2 as ONE record). Same t2 index and
# flat taxonomy as the classify tier.
paired_stage() {
  local D=$WORK/data/t2
  echo "[refbaseline] generating paired reads from t2"
  awk 'NR % 4 == 1 { t = $1 }
       NR % 4 == 2 { n = length($0); h = int(n / 2);
         print t "/1"; print substr($0, 1, h); print "+"
         qline1 = sprintf("%0" h "d", 0); gsub(/0/, "I", qline1); print qline1 }' \
    "$D/reads.fastq" > "$D/reads_1.fastq"
  awk 'NR % 4 == 1 { t = $1 }
       NR % 4 == 2 { n = length($0); h = int(n / 2);
         print t "/2"; print substr($0, h + 1); print "+"
         q = sprintf("%0" (n - h) "d", 0); gsub(/0/, "I", q); print q }' \
    "$D/reads.fastq" > "$D/reads_2.fastq"

  declare -A PTIMES
  for rep in $(seq 1 ${REPS_PE:-3}); do
    for eng in ref graft; do
      rm -rf "$WORK/idx_${eng}_pe" "$WORK/outpe_${eng}"* "$WORK/scratch_$eng" \
        && mkdir -p "$WORK/scratch_$eng"
      if [[ $eng == ref ]]; then
        b=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_pe_build_$rep.log" \
          build -k 35 -m 31 --spaces 7 \
          --taxonomy "$WORK/data/taxonomy" --library "$D/lib" \
          --index "$WORK/idx_ref_pe")
        c=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_pe_classify_$rep.log" \
          classify --index "$WORK/idx_ref_pe" --paired \
          --output "$WORK/outpe_ref" -c 0.0 \
          "$D/reads_1.fastq" "$D/reads_2.fastq")
      else
        b=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_pe_build_$rep.log" \
          build -k 35 -m 31 -s 7 --taxonomy "$WORK/data/taxonomy" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_pe")
        c=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_pe_classify_$rep.log" \
          classify --index "$WORK/idx_graft_pe" \
          --reads "$D/reads_1.fastq" --reads2 "$D/reads_2.fastq" \
          --output "$WORK/outpe_graft")
      fi
      PTIMES[${eng}_pe_build_$rep]=$b
      PTIMES[${eng}_pe_classify_$rep]=$c
      echo "[refbaseline] $eng paired rep$rep: build=${b}s classify=${c}s"
    done
  done

  # decisions compare: reuse the classify2 comparator's per-read logic by
  # comparing (status, title, taxon) from both per-read output dirs
  python3 - "$WORK/outpe_ref_c0.0" "$WORK/outpe_graft" <<'PYEOF' \
    | tee "$WORK/out/paired_compare.txt"
import sys, glob, gzip, os
def rows(d):
    out = []
    for f in sorted(glob.glob(os.path.join(d, "sample=*", "*"))):
        if f.endswith(("_SUCCESS", ".crc")) or os.path.isdir(f): continue
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            for l in fh:
                p = l.rstrip("\n").split("\t")
                if len(p) >= 3: out.append((p[0], p[1], p[2]))
    return sorted(out)
a, b = rows(sys.argv[1]), rows(sys.argv[2])
if a == b:
    print(f"paired per-read: MATCH ({len(a)} pairs, "
          f"{sum(1 for r in a if r[0]=='C')} classified)")
    sys.exit(0)
print(f"paired per-read: MISMATCH (ref {len(a)}, graft {len(b)})")
for r in sorted(set(a) - set(b))[:5]: print("  ref-only:  ", r)
for r in sorted(set(b) - set(a))[:5]: print("  graft-only:", r)
sys.exit(1)
PYEOF

  {
    echo -n '{"stage":"paired","reps":'${REPS_PE:-3}',"rep_factor":'$REP_FACTOR',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7,paired"'
    for key in "${!PTIMES[@]}"; do echo -n ",\"$key\":${PTIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_paired.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_paired.json"
  cat "$WORK/out/headtohead_paired.json"
}

# Respace head-to-head: build both engines' t1 indexes at s=7, respace
# each to s=11 (the reference's dimensionality-reduction path:
# KeyValueIndex.respace re-masks stored minimizers and re-folds LCAs),
# then compare BOTH the base and the respaced indexes by full on-disk
# CONTENT (multiset of (key, taxon) rows — compare_index.py over the
# bucketed parquet both engines write).
respace_stage() {
  local D=$WORK/data/t1
  declare -A RSTIMES
  for rep in $(seq 1 ${REPS_RS:-3}); do
    for eng in ref graft; do
      rm -rf "$WORK/idx_${eng}_rs"* "$WORK/scratch_$eng" \
        && mkdir -p "$WORK/scratch_$eng"
      if [[ $eng == ref ]]; then
        b=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_rs_build_$rep.log" \
          build -k 35 -m 31 --spaces 7 \
          --taxonomy "$WORK/data/taxonomy" --library "$D/lib" \
          --index "$WORK/idx_ref_rs_s7")
        r=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_rs_respace_$rep.log" \
          respace --index "$WORK/idx_ref_rs_s7" --spaces 11 \
          --output "$WORK/idx_ref_rs_s7")
      else
        b=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_rs_build_$rep.log" \
          build -k 35 -m 31 -s 7 --taxonomy "$WORK/data/taxonomy" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_rs_s7")
        r=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_rs_respace_$rep.log" \
          respace --index "$WORK/idx_graft_rs_s7" --s 11 \
          --output "$WORK/idx_graft_rs")
      fi
      RSTIMES[${eng}_rs_build_$rep]=$b
      RSTIMES[${eng}_rs_respace_$rep]=$r
      echo "[refbaseline] $eng respace rep$rep: build=${b}s respace=${r}s"
    done
  done

  {
    echo "== base (s=7) index content =="
    python3 "$REPO/tools/refbaseline/compare_index.py" \
      "$WORK/idx_ref_rs_s7" "$WORK/idx_graft_rs_s7" 2
    echo "== respaced (s=11) index content =="
    python3 "$REPO/tools/refbaseline/compare_index.py" \
      "$WORK/idx_ref_rs_s11" "$WORK/idx_graft_rs_s11" 2
  } | tee "$WORK/out/respace_compare.txt"

  {
    echo -n '{"stage":"respace","reps":'${REPS_RS:-3}',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7->11"'
    for key in "${!RSTIMES[@]}"; do echo -n ",\"$key\":${RSTIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_respace.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_respace.json"
  cat "$WORK/out/headtohead_respace.json"
}

# Multi-sample classification head-to-head: the t2 reads carry a _rN
# suffix per replication copy, so "_r([0-9]+)$" partitions them into
# REP_FACTOR samples. Both engines classify once with the regex, write
# per-sample per-read output AND per-sample kreports; the compare checks
# the (sample, status, title, taxon) quads and every per-sample kreport
# line for line.
multisample_stage() {
  local D=$WORK/data/t2
  local REGEX='_r([0-9]+)$'
  declare -A MTIMES
  for rep in $(seq 1 ${REPS_MS:-3}); do
    for eng in ref graft; do
      rm -rf "$WORK/idx_${eng}_ms" "$WORK/outms_${eng}"* "$WORK/scratch_$eng" \
        && mkdir -p "$WORK/scratch_$eng"
      if [[ $eng == ref ]]; then
        b=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_ms_build_$rep.log" \
          build -k 35 -m 31 --spaces 7 \
          --taxonomy "$WORK/data/taxonomy" --library "$D/lib" \
          --index "$WORK/idx_ref_ms")
        c=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_ms_classify_$rep.log" \
          classify --index "$WORK/idx_ref_ms" --sample-regex "$REGEX" \
          --output "$WORK/outms_ref" -c 0.0 "$D/reads.fastq")
      else
        b=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_ms_build_$rep.log" \
          build -k 35 -m 31 -s 7 --taxonomy "$WORK/data/taxonomy" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_ms")
        c=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_ms_classify_$rep.log" \
          classify --index "$WORK/idx_graft_ms" --reads "$D/reads.fastq" \
          --sample-regex "$REGEX" --output "$WORK/outms_graft")
      fi
      MTIMES[${eng}_ms_build_$rep]=$b
      MTIMES[${eng}_ms_classify_$rep]=$c
      echo "[refbaseline] $eng multisample rep$rep: build=${b}s classify=${c}s"
    done
  done

  python3 - "$WORK/outms_ref_c0.0" "$WORK/outms_graft" \
    "$WORK/outms_ref_c0.0" "$WORK/outms_graft_reports" <<'PYEOF' \
    | tee "$WORK/out/multisample_compare.txt"
import sys, glob, gzip, os, re
refd, gd, refrep, grep_ = sys.argv[1:5]
def quads(d):
    out = []
    for sd in sorted(glob.glob(os.path.join(d, "sample=*"))):
        s = os.path.basename(sd).split("=", 1)[1]
        for f in sorted(glob.glob(os.path.join(sd, "*"))):
            if f.endswith(("_SUCCESS", ".crc")) or os.path.isdir(f): continue
            op = gzip.open if f.endswith(".gz") else open
            with op(f, "rt") as fh:
                for l in fh:
                    p = l.rstrip("\n").split("\t")
                    if len(p) >= 3: out.append((s, p[0], p[1], p[2]))
    return sorted(out)
ok = True
a, b = quads(refd), quads(gd)
if a == b:
    ns = len({q[0] for q in a})
    print(f"multisample per-read: MATCH ({len(a)} rows, {ns} samples, "
          f"{sum(1 for q in a if q[1]=='C')} classified)")
else:
    ok = False
    print(f"multisample per-read: MISMATCH (ref {len(a)}, graft {len(b)})")
    for r in sorted(set(a) - set(b))[:5]: print("  ref-only:  ", r)
    for r in sorted(set(b) - set(a))[:5]: print("  graft-only:", r)
def reports(d, pat):
    # normalize the reference's presentation extras: its default
    # (non-compatible) format adds a "#Perc..." header and pads the percent
    # with %6.2f; graft emits the kraken2-compatible format (no header, no
    # padding). Content is compared after stripping both.
    out = {}
    for f in glob.glob(os.path.join(d, pat)):
        s = re.sub(r"[._]kreport\.txt$", "", os.path.basename(f))
        out[s] = [l.rstrip("\n").lstrip(" ") for l in open(f)
                  if l.strip() and not l.startswith("#")]
    return out
ra = reports(refrep, "*_kreport.txt")
rb = reports(grep_, "*.kreport.txt")
if set(ra) != set(rb):
    ok = False
    print(f"kreports: sample sets differ ref={sorted(ra)[:5]}... graft={sorted(rb)[:5]}...")
else:
    bad = [s for s in ra if ra[s] != rb[s]]
    if bad:
        ok = False
        print(f"kreports: {len(bad)} of {len(ra)} differ, e.g. {bad[:3]}")
        s = bad[0]
        for x, y in zip(ra[s], rb[s]):
            if x != y: print(f"  {s}: ref {x!r} vs graft {y!r}"); break
    else:
        print(f"kreports: MATCH ({len(ra)} samples, line for line)")
sys.exit(0 if ok else 1)
PYEOF

  {
    echo -n '{"stage":"multisample","reps":'${REPS_MS:-3}',"rep_factor":'$REP_FACTOR',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7,sample-regex"'
    for key in "${!MTIMES[@]}"; do echo -n ",\"$key\":${MTIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_multisample.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_multisample.json"
  cat "$WORK/out/headtohead_multisample.json"
}

# Gold-set classify2: the detection heuristic is REPLACED by a supplied
# taxon list (reference --gold-set + --classify-with-gold; graft --gold).
# Gold = species 200 -> both engines must classify against the cdiff
# clade only. Reuses the t3 tier.
gold_stage() {
  gen_data_t3
  local D=$WORK/data/t3
  printf '200\n' > "$D/gold.txt"
  declare -A GTIMES
  for rep in $(seq 1 ${REPS_GOLD:-3}); do
    for eng in ref graft; do
      rm -rf "$WORK/idx_${eng}_gold" "$WORK/outgold_${eng}"* \
        "$WORK/scratch_$eng" && mkdir -p "$WORK/scratch_$eng"
      if [[ $eng == ref ]]; then
        b=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_gold_build_$rep.log" \
          build -k 35 -m 31 --spaces 7 \
          --taxonomy "$D/taxonomy" --library "$D/lib" \
          --index "$WORK/idx_ref_gold")
        c=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_gold_classify2_$rep.log" \
          classify2 --index "$WORK/idx_ref_gold" --library "$D/lib" \
          --gold-set "$D/gold.txt" --classify-with-gold \
          --output "$WORK/outgold_ref" "$D/reads.fastq")
      else
        b=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_gold_build_$rep.log" \
          build -k 35 -m 31 -s 7 --taxonomy "$D/taxonomy" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_gold")
        c=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_gold_classify2_$rep.log" \
          classify2 --index "$WORK/idx_graft_gold" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" \
          --reads "$D/reads.fastq" --gold "$D/gold.txt" \
          --output "$WORK/outgold_graft")
      fi
      GTIMES[${eng}_gold_build_$rep]=$b
      GTIMES[${eng}_gold_classify2_$rep]=$c
      echo "[refbaseline] $eng gold rep$rep: build=${b}s classify2=${c}s"
    done
  done

  python3 - "$WORK/outgold_ref_c0.0" "$WORK/outgold_graft" <<'PYEOF' \
    | tee "$WORK/out/gold_compare.txt"
import sys, glob, gzip, os
def rows(d):
    out = []
    for f in sorted(glob.glob(os.path.join(d, "sample=*", "*"))):
        if f.endswith(("_SUCCESS", ".crc")) or os.path.isdir(f): continue
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            for l in fh:
                p = l.rstrip("\n").split("\t")
                if len(p) >= 3: out.append((p[0], p[1], p[2]))
    return sorted(out)
a, b = rows(sys.argv[1]), rows(sys.argv[2])
if a == b:
    print(f"gold classify2 per-read: MATCH ({len(a)} reads, "
          f"{sum(1 for r in a if r[0]=='C')} classified)")
    sys.exit(0)
print(f"gold classify2 per-read: MISMATCH (ref {len(a)}, graft {len(b)})")
for r in sorted(set(a) - set(b))[:5]: print("  ref-only:  ", r)
for r in sorted(set(b) - set(a))[:5]: print("  graft-only:", r)
sys.exit(1)
PYEOF

  {
    echo -n '{"stage":"gold","reps":'${REPS_GOLD:-3}',"rep_factor":'$REP_FACTOR',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7,gold={200}"'
    for key in "${!GTIMES[@]}"; do echo -n ",\"$key\":${GTIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_gold.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_gold.json"
  cat "$WORK/out/headtohead_gold.json"
}

# Per-sample classify2 head-to-head (graft extension vs the honest
# reference equivalent). graft's classify2 --per-sample selects taxa and
# tailors a sub-index PER SAMPLE in one distributed pass; the reference
# has no such mode, so its honest counterpart is a SERIAL loop of
# reference classify2 over each sample's reads separately (same
# selection semantics per sample, paid once per sample). Tier: the t3
# hierarchical taxonomy with the 64-sample t2 reads (_rN suffix = sample).
# Threshold 2 per sample (each sample holds one 10k-read copy: ~3 cdiff
# first-pass reads >= 2, 1 human read < 2 — a real per-sample selection,
# same shape as the pinned t1 classify2 golden).
persample_stage() {
  gen_data_t3
  local D=$WORK/data/t3
  local REGEX='_r([0-9]+)$'
  local THRESH=${R_THRESH_PS:-2}
  local NS=$REP_FACTOR

  echo "[refbaseline] splitting t3 reads into $NS per-sample fastqs"
  rm -rf "$D/persample" && mkdir -p "$D/persample"
  awk -v outdir="$D/persample" '
    NR % 4 == 1 { t = $0; sub(/.*_r/, "", t); f = outdir "/s" t ".fastq" }
    { print >> f }' "$D/reads.fastq"

  declare -A PSTIMES
  # one index per engine, reused across reps (build timed once).
  # PS_ENGINES=graft runs a graft-only SCALE probe (e.g. the sf1-style
  # 10x step-up, where the reference's serial loop would take hours);
  # the cross-engine compare is skipped since there is nothing to compare.
  for eng in ${PS_ENGINES:-ref graft}; do
    rm -rf "$WORK/idx_${eng}_ps" "$WORK/scratch_$eng" && mkdir -p "$WORK/scratch_$eng"
    if [[ $eng == ref ]]; then
      b=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_ps_build.log" \
        build -k 35 -m 31 --spaces 7 \
        --taxonomy "$D/taxonomy" --library "$D/lib" \
        --index "$WORK/idx_ref_ps")
    else
      b=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_ps_build.log" \
        build -k 35 -m 31 -s 7 --taxonomy "$D/taxonomy" \
        --library "$D/lib/library/genomes.fna" \
        --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_ps")
    fi
    PSTIMES[${eng}_ps_build]=$b
    echo "[refbaseline] $eng per-sample index build=${b}s"
  done

  # graft: REPS_PS reps of the one-pass per-sample classify2
  for rep in $(seq 1 ${REPS_PS:-3}); do
    rm -rf "$WORK/outps_graft"*
    c=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_ps_classify2_$rep.log" \
      classify2 --index "$WORK/idx_graft_ps" \
      --library "$D/lib/library/genomes.fna" \
      --labels "$D/lib/seqid2taxid.map" \
      --reads "$D/reads.fastq" --criterion reads --threshold $THRESH \
      --init-confidence 0.0 --rank species \
      --sample-regex "$REGEX" --per-sample \
      --output "$WORK/outps_graft")
    PSTIMES[graft_ps_classify2_$rep]=$c
    echo "[refbaseline] graft per-sample rep$rep: classify2=${c}s"
  done

  # reference: serial per-sample loop, REPS_PS_REF reps (default 1 — the
  # loop is ~NS full classify2 runs; its cost IS the honest number)
  if [[ ${PS_ENGINES:-ref graft} == *ref* ]]; then
  for rep in $(seq 1 ${REPS_PS_REF:-1}); do
    rm -rf "$WORK/outps_ref"*
    t0=$(date +%s.%N)
    for s in $(seq 0 $((NS - 1))); do
      ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_ps_classify2_${rep}_s$s.log" \
        classify2 --index "$WORK/idx_ref_ps" --library "$D/lib" \
        --reads $THRESH --init-confidence 0.0 --rank species \
        --output "$WORK/outps_ref_s$s" "$D/persample/s$s.fastq" > /dev/null
    done
    t1=$(date +%s.%N)
    PSTIMES[ref_ps_classify2_$rep]=$(echo "$t1 $t0" | awk '{printf "%.2f", $1-$2}')
    echo "[refbaseline] ref per-sample rep$rep (serial x$NS): ${PSTIMES[ref_ps_classify2_$rep]}s"
  done
  fi

  # correctness: union of the reference's per-sample decisions ==
  # graft's per-sample quads (sample extracted from the title suffix)
  if [[ ${PS_ENGINES:-ref graft} == *ref* ]]; then
  python3 - "$WORK" "$NS" <<'PYEOF' | tee "$WORK/out/persample_compare.txt"
import sys, glob, gzip, os, re
work, ns = sys.argv[1], int(sys.argv[2])
def rows(d):
    out = []
    for f in sorted(glob.glob(os.path.join(d, "sample=*", "*"))):
        if f.endswith(("_SUCCESS", ".crc")) or os.path.isdir(f): continue
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            for l in fh:
                p = l.rstrip("\n").split("\t")
                if len(p) >= 3: out.append((p[0], p[1], p[2]))
    return out
ref = []
for s in range(ns):
    d = glob.glob(os.path.join(work, f"outps_ref_s{s}_c*"))
    if not d:
        print(f"per-sample: MISSING reference output for sample {s}"); sys.exit(1)
    ref.extend(rows(d[0]))
graft = rows(os.path.join(work, "outps_graft"))
ref.sort(); graft.sort()
if ref == graft:
    print(f"per-sample per-read: MATCH ({len(ref)} reads, "
          f"{sum(1 for r in ref if r[0]=='C')} classified, {ns} samples)")
    sys.exit(0)
print(f"per-sample per-read: MISMATCH (ref {len(ref)}, graft {len(graft)})")
for r in sorted(set(ref) - set(graft))[:5]: print("  ref-only:  ", r)
for r in sorted(set(graft) - set(ref))[:5]: print("  graft-only:", r)
sys.exit(1)
PYEOF
  fi

  {
    echo -n '{"stage":"persample","reps_graft":'${REPS_PS:-3}',"reps_ref":'${REPS_PS_REF:-1}',"samples":'$NS',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7,R='$THRESH',init_conf=0.0,rank=species,per-sample"'
    for key in "${!PSTIMES[@]}"; do echo -n ",\"$key\":${PSTIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_persample.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_persample.json"
  cat "$WORK/out/headtohead_persample.json"
}

# Bracken weights at t2 scale: the r15 bracken tier was t1-size; this one
# replicates the 10-taxon bk library REP_FACTOR x with fresh sequence ids
# (same protocol as the t2 classify tier), so the weights computation sees
# 64x the genome volume. Reuses compare_bracken.py for output equality.
bracken_t2_stage() {
  local D=$WORK/data/bk2
  mkdir -p "$D/taxonomy" "$D/lib/library"
  {
    printf '1\t|\t1\t|\tno rank\t|\n'
    for i in $(seq 101 110); do printf '%s\t|\t1\t|\tspecies\t|\n' $i; done
  } > "$D/taxonomy/nodes.dmp"
  {
    printf '1\t|\troot\t|\t\t|\tscientific name\t|\n'
    for i in $(seq 101 110); do
      printf '%s\t|\tspecies %s\t|\t\t|\tscientific name\t|\n' $i $i
    done
  } > "$D/taxonomy/names.dmp"
  : > "$D/taxonomy/merged.dmp"
  for ((r = 0; r < REP_FACTOR; r++)); do
    awk -v r=$r '/^>/{ split(substr($0,2), h, " "); print ">" h[1] "_r" r; next } { print }' \
      "$WORK/data/t1/lib/library/genomes.fna"
  done > "$D/lib/library/genomes.fna"
  awk '/^>/{
    split(substr($0,2), h, " ");
    if (h[1] ~ /^chr1H/) t = 110; else { t = 101 + (n % 9); n++ }
    print h[1] "\t" t
  }' "$D/lib/library/genomes.fna" > "$D/lib/seqid2taxid.map"
  du -sh "$D/lib/library/genomes.fna"

  declare -A BK2TIMES
  for rep in $(seq 1 ${REPS_BK2:-3}); do
    for eng in ref graft; do
      rm -rf "$WORK/idx_${eng}_bk2"* "$WORK/bk2_${eng}"* "$WORK/scratch_$eng" \
        && mkdir -p "$WORK/scratch_$eng"
      if [[ $eng == ref ]]; then
        b=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_bk2_build_$rep.log" \
          build -k 35 -m 31 --spaces 7 \
          --taxonomy "$D/taxonomy" --library "$D/lib" \
          --index "$WORK/idx_ref_bk2")
        w=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_bk2_weights_$rep.log" \
          bracken-build --index "$WORK/idx_ref_bk2" --library "$D/lib" \
          --read-len 100)
      else
        b=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_bk2_build_$rep.log" \
          build -k 35 -m 31 -s 7 --taxonomy "$D/taxonomy" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_bk2")
        w=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_bk2_weights_$rep.log" \
          bracken --index "$WORK/idx_graft_bk2" \
          --library "$D/lib/library/genomes.fna" \
          --labels "$D/lib/seqid2taxid.map" \
          --read-len 100 --output "$WORK/bk2_graft")
      fi
      BK2TIMES[${eng}_bk2_build_$rep]=$b
      BK2TIMES[${eng}_bk2_weights_$rep]=$w
      echo "[refbaseline] $eng bracken-t2 rep$rep: build=${b}s weights=${w}s"
    done
  done

  python3 "$REPO/tools/refbaseline/compare_bracken.py" \
    "$WORK/idx_ref_bk2_bracken/database100mers.kmer_distrib" \
    "$WORK/bk2_graft" | tee "$WORK/out/bracken_t2_compare.txt"

  {
    echo -n '{"stage":"bracken_t2","reps":'${REPS_BK2:-3}',"rep_factor":'$REP_FACTOR',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7,readLen=100,'$REP_FACTOR'x"'
    for key in "${!BK2TIMES[@]}"; do echo -n ",\"$key\":${BK2TIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_bracken_t2.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_bracken_t2.json"
  cat "$WORK/out/headtohead_bracken_t2.json"
}

# Index-statistics head-to-head (reference `stats` vs graft `stats`) on the
# t1 index. The reference prints its summary (tree size, stored/leaf taxa,
# total/leaf records) and, with --histogram, rank-depth histograms; graft
# writes its per-taxon minimizer counts as TSV. compare_indexstats.py
# derives the reference's numbers independently from graft's OUTPUT plus
# nodes.dmp and requires exact equality.
indexstats_stage() {
  local D=$WORK/data/t1
  rm -rf "$WORK/idx_ref_is" "$WORK/idx_graft_is" "$WORK"/stats_graft* \
    "$WORK/scratch_ref" "$WORK/scratch_graft"
  mkdir -p "$WORK/scratch_ref" "$WORK/scratch_graft"
  declare -A ISTIMES
  ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_is_build.log" \
    build -k 35 -m 31 --spaces 7 --taxonomy "$WORK/data/taxonomy" \
    --library "$D/lib" --index "$WORK/idx_ref_is" > /dev/null
  graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_is_build.log" \
    build -k 35 -m 31 -s 7 --taxonomy "$WORK/data/taxonomy" \
    --library "$D/lib/library/genomes.fna" \
    --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_is" > /dev/null
  for rep in $(seq 1 ${REPS_IS:-3}); do
    # fresh stats memo per rep on the graft side: the on-disk _taxon_counts
    # memo is part of graft's design, but the RACE times the cold scan
    rm -rf "$WORK/idx_graft_is/_taxon_counts" "$WORK/stats_graft"
    s=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_is_stats_$rep.log" \
      stats --index "$WORK/idx_ref_is")
    g=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_is_stats_$rep.log" \
      stats --index "$WORK/idx_graft_is" --output "$WORK/stats_graft")
    ISTIMES[ref_is_stats_$rep]=$s
    ISTIMES[graft_is_stats_$rep]=$g
    echo "[refbaseline] indexstats rep$rep: ref=${s}s graft=${g}s"
  done
  # equality payload: the reference's own printed numbers + histograms
  ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_is_histogram.log" \
    stats --index "$WORK/idx_ref_is" --histogram > /dev/null

  {
    echo -n '{"stage":"indexstats","reps":'${REPS_IS:-3}',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7,t1"'
    for key in "${!ISTIMES[@]}"; do echo -n ",\"$key\":${ISTIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_indexstats.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_indexstats.json"
  cat "$WORK/out/headtohead_indexstats.json"

  python3 "$REPO/tools/refbaseline/compare_indexstats.py" \
    "$WORK/out/ref_is_stats_1.log" "$WORK/out/ref_is_histogram.log" \
    "$WORK/stats_graft" "$WORK/data/taxonomy/nodes.dmp" \
    | tee "$WORK/out/indexstats_compare.txt"
}

# Index-comparison head-to-head (reference `compareIndex` /
# MinimizerMigration vs graft `compareIndex`): subject = index built from
# the FIRST HALF of the t1 genomes, reference = index from all of them,
# under the hierarchical t3-style taxonomy (rank-depth migration is
# degenerate on the flat t1 taxonomy — strains inherit root's depth 0).
# Equality: the rank-step histogram (reference's show() vs graft's
# _migration TSV) and the _taxaToRoot_report.txt kreports, line for line.
compareidx_stage() {
  local D=$WORK/data/cmpidx
  rm -rf "$D" && mkdir -p "$D/taxonomy" "$D/libA/library" "$D/libB/library"
  cat > "$D/taxonomy/nodes.dmp" <<'EOF'
1	|	1	|	no rank	|
100	|	1	|	genus	|
200	|	100	|	species	|
300	|	100	|	species	|
455631	|	200	|	strain	|
526997	|	300	|	strain	|
9606	|	1	|	species	|
EOF
  cat > "$D/taxonomy/names.dmp" <<'EOF'
1	|	root	|		|	scientific name	|
100	|	genus one	|		|	scientific name	|
200	|	Clostridioides difficile	|		|	scientific name	|
300	|	Bacillus mycoides	|		|	scientific name	|
455631	|	Clostridioides difficile QCD-66c26	|		|	scientific name	|
526997	|	Bacillus mycoides DSM 2048	|		|	scientific name	|
9606	|	Homo sapiens	|		|	scientific name	|
EOF
  : > "$D/taxonomy/merged.dmp"
  cp "$WORK/data/t1/lib/library/genomes.fna" "$D/libB/library/genomes.fna"
  cp "$WORK/data/t1/lib/seqid2taxid.map" "$D/libB/seqid2taxid.map"
  # subject library: the first half of the records (deterministic)
  local total
  total=$(grep -c '^>' "$D/libB/library/genomes.fna")
  awk -v keep=$((total / 2)) '/^>/{n++} n <= keep { print }' \
    "$D/libB/library/genomes.fna" > "$D/libA/library/genomes.fna"
  cp "$D/libB/seqid2taxid.map" "$D/libA/seqid2taxid.map"

  rm -rf "$WORK"/idx_{ref,graft}_cmp{A,B} "$WORK"/cmp_{ref,graft}* \
    "$WORK/scratch_ref" "$WORK/scratch_graft"
  mkdir -p "$WORK/scratch_ref" "$WORK/scratch_graft"
  for side in A B; do
    ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_cmp_build$side.log" \
      build -k 35 -m 31 --spaces 7 --taxonomy "$D/taxonomy" \
      --library "$D/lib$side" --index "$WORK/idx_ref_cmp$side" > /dev/null
    graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_cmp_build$side.log" \
      build -k 35 -m 31 -s 7 --taxonomy "$D/taxonomy" \
      --library "$D/lib$side/library/genomes.fna" \
      --labels "$D/lib$side/seqid2taxid.map" \
      --output "$WORK/idx_graft_cmp$side" > /dev/null
  done

  declare -A CITIMES
  for rep in $(seq 1 ${REPS_CI:-3}); do
    rm -rf "$WORK"/cmp_graft*
    r=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_cmpidx_$rep.log" \
      compareIndex --index "$WORK/idx_ref_cmpA" \
      --reference "$WORK/idx_ref_cmpB" --output "$WORK/cmp_ref")
    g=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_cmpidx_$rep.log" \
      compareIndex --index "$WORK/idx_graft_cmpA" \
      --reference "$WORK/idx_graft_cmpB" --output "$WORK/cmp_graft")
    CITIMES[ref_cmpidx_$rep]=$r
    CITIMES[graft_cmpidx_$rep]=$g
    echo "[refbaseline] compareIndex rep$rep: ref=${r}s graft=${g}s"
  done

  {
    echo -n '{"stage":"compareidx","reps":'${REPS_CI:-3}',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7,halfT1-vs-fullT1,hier-taxonomy"'
    for key in "${!CITIMES[@]}"; do echo -n ",\"$key\":${CITIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead_compareidx.json"
  echo "[refbaseline] wrote $WORK/out/headtohead_compareidx.json"
  cat "$WORK/out/headtohead_compareidx.json"

  python3 "$REPO/tools/refbaseline/compare_migration.py" \
    "$WORK/out/ref_cmpidx_1.log" "$WORK/cmp_ref_taxaToRoot_report.txt" \
    "$WORK/cmp_graft_migration" "$WORK/cmp_graft_taxaToRoot_report.txt" \
    | tee "$WORK/out/compareidx_compare.txt"
}

# ------------------------------------------------------------------- runs
run_timed() { # name cwd log... -> prints seconds; args after log are the cmd
  local name=$1 cwd=$2 log=$3; shift 3
  local t0 t1
  t0=$(date +%s.%N)
  (cd "$cwd" && "$@") >> "$log" 2>&1
  t1=$(date +%s.%N)
  echo "$(echo "$t1 $t0" | awk '{printf "%.2f", $1-$2}')"
}

ref_cmd() { # scratch-cwd log args...
  local cwd=$1 log=$2; shift 2
  run_timed ref "$cwd" "$log" java "${JVM_FLAGS[@]}" \
    -Dderby.system.home="$WORK/scratch_ref" \
    -Dspark.sql.warehouse.dir="$WORK/scratch_ref/warehouse" \
    -cp "$SPARKCP:$BUILD/classes" com.jnpersson.slacken.Slacken \
    --partitions $BUCKETS "$@"
}

graft_cmd() { # scratch-cwd log args...
  local cwd=$1 log=$2; shift 2
  SPARK_MASTER=local[$CPUS] run_timed graft "$cwd" "$log" \
    java "${JVM_FLAGS[@]}" \
    -Dderby.system.home="$WORK/scratch_graft" \
    -Dspark.sql.warehouse.dir="$WORK/scratch_graft/warehouse" \
    -cp "$SPARKCP:$REPO/target/scala-2.13/classes" graft.Main \
    "$@" -p $BUCKETS
}

# REFBASELINE_SMOKE=1: CI-light re-verification that the toolchain still
# works — compiles the shimmed reference from sources, rebuilds both
# engines' t1 indexes, runs one classify each, and checks the per-read
# decisions still match bit for bit. No timing race, minutes not hours.
# Catches toolchain drift (Spark/scala upgrades breaking the shim or the
# reference compile) before anyone trusts a full race.
smoke() {
  if [[ -z ${SKIP_COMPILE:-} ]]; then compile_reference; fi
  REP_FACTOR=2 gen_data   # t1 is what smoke uses; keep the t2 gen tiny
  echo "[refbaseline] building graft classes"
  (cd "$REPO" && sbt -batch compile > "$WORK/out/sbt_compile.log" 2>&1)
  local D=$WORK/data/t1
  rm -rf "$WORK"/idx_{ref,graft}_smoke "$WORK"/out_{ref,graft}_smoke* \
    "$WORK"/scratch_{ref,graft}
  mkdir -p "$WORK/scratch_ref" "$WORK/scratch_graft"
  ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_smoke.log" \
    build -k 35 -m 31 --spaces 7 --taxonomy "$WORK/data/taxonomy" \
    --library "$D/lib" --index "$WORK/idx_ref_smoke" > /dev/null
  ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_smoke.log" \
    classify --index "$WORK/idx_ref_smoke" \
    --output "$WORK/out_ref_smoke" -c 0.0 "$D/reads.fastq" > /dev/null
  graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_smoke.log" \
    build -k 35 -m 31 -s 7 --taxonomy "$WORK/data/taxonomy" \
    --library "$D/lib/library/genomes.fna" \
    --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_smoke" > /dev/null
  graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_smoke.log" \
    classify --index "$WORK/idx_graft_smoke" --reads "$D/reads.fastq" \
    --output "$WORK/out_graft_smoke" > /dev/null
  python3 - "$WORK/out_ref_smoke_c0.0" "$WORK/out_graft_smoke" <<'PYEOF'
import sys, glob, gzip, os
def rows(d):
    out = []
    for f in sorted(glob.glob(os.path.join(d, "sample=*", "*"))):
        if f.endswith(("_SUCCESS", ".crc")) or os.path.isdir(f): continue
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            for l in fh:
                p = l.rstrip("\n").split("\t")
                if len(p) >= 3: out.append((p[0], p[1], p[2]))
    return sorted(out)
a, b = rows(sys.argv[1]), rows(sys.argv[2])
if a == b and a:
    print(f"[refbaseline] SMOKE OK: {len(a)} per-read decisions identical "
          f"({sum(1 for r in a if r[0]=='C')} classified)")
    sys.exit(0)
print(f"[refbaseline] SMOKE FAIL: ref {len(a)} rows, graft {len(b)} rows")
for r in sorted(set(a) - set(b))[:5]: print("  ref-only:  ", r)
for r in sorted(set(b) - set(a))[:5]: print("  graft-only:", r)
sys.exit(1)
PYEOF
}

main() {
  if [[ ${REFBASELINE_SMOKE:-0} == 1 ]]; then smoke; return; fi
  if [[ -z ${SKIP_COMPILE:-} ]]; then compile_reference; fi
  gen_data
  echo "[refbaseline] building graft classes"
  (cd "$REPO" && sbt -batch compile > "$WORK/out/sbt_compile.log" 2>&1)

  declare -A TIMES
  for tier in ${TIERS:-t1 t2}; do
    D=$WORK/data/$tier
    tierReps=$REPS
    [[ $tier == t2 ]] && tierReps=${REPS_T2:-$REPS}
    for rep in $(seq 1 $tierReps); do
      # ENGINES="graft" races one engine only (e.g. a graft topology probe
      # against already-recorded reference numbers)
      for eng in ${ENGINES:-ref graft}; do
        rm -rf "$WORK/idx_${eng}_$tier" "$WORK/out_${eng}_$tier" \
          "$WORK/scratch_$eng" && mkdir -p "$WORK/scratch_$eng"
        if [[ $eng == ref ]]; then
          b=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_${tier}_build_$rep.log" \
            build -k 35 -m 31 --spaces 7 \
            --taxonomy "$WORK/data/taxonomy" --library "$D/lib" \
            --index "$WORK/idx_ref_$tier")
          c=$(ref_cmd "$WORK/scratch_ref" "$WORK/out/ref_${tier}_classify_$rep.log" \
            classify --index "$WORK/idx_ref_$tier" \
            --output "$WORK/out_ref_$tier" -c 0.0 "$D/reads.fastq")
        else
          b=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_${tier}_build_$rep.log" \
            build -k 35 -m 31 -s 7 --taxonomy "$WORK/data/taxonomy" \
            --library "$D/lib/library/genomes.fna" \
            --labels "$D/lib/seqid2taxid.map" --output "$WORK/idx_graft_$tier")
          # GRAFT_CLASSIFY_FLAGS: extra classify flags for topology races,
          # e.g. "--in-memory false" forces the one-sided bucketed
          # sort-merge join (the 100 TB path) instead of the broadcast table
          c=$(graft_cmd "$WORK/scratch_graft" "$WORK/out/graft_${tier}_classify_$rep.log" \
            classify --index "$WORK/idx_graft_$tier" --reads "$D/reads.fastq" \
            ${GRAFT_CLASSIFY_FLAGS:-} \
            --output "$WORK/out_graft_$tier")
        fi
        TIMES[${eng}_${tier}_build_$rep]=$b
        TIMES[${eng}_${tier}_classify_$rep]=$c
        echo "[refbaseline] $eng $tier rep$rep: build=${b}s classify=${c}s"
      done
    done
  done

  {
    echo -n '{"reps":'$REPS',"rep_factor":'$REP_FACTOR',"cpus":'$CPUS',"buckets":'$BUCKETS',"heap":"'$HEAP'","params":"k=35,m=31,s=7"'
    for key in "${!TIMES[@]}"; do echo -n ",\"$key\":${TIMES[$key]}"; done
    echo '}'
  } > "$WORK/out/headtohead.json"
  echo "[refbaseline] wrote $WORK/out/headtohead.json"
  cat "$WORK/out/headtohead.json"

  if [[ ${CLASSIFY2:-0} == 1 ]]; then classify2_stage; fi
  if [[ ${BRACKEN:-0} == 1 ]]; then bracken_stage; fi
  if [[ ${PAIRED:-0} == 1 ]]; then paired_stage; fi
  if [[ ${RESPACE:-0} == 1 ]]; then respace_stage; fi
  if [[ ${MULTISAMPLE:-0} == 1 ]]; then multisample_stage; fi
  if [[ ${GOLD:-0} == 1 ]]; then gold_stage; fi
  if [[ ${PERSAMPLE:-0} == 1 ]]; then persample_stage; fi
  if [[ ${BRACKEN_T2:-0} == 1 ]]; then bracken_t2_stage; fi
  if [[ ${INDEXSTATS:-0} == 1 ]]; then indexstats_stage; fi
  if [[ ${COMPAREIDX:-0} == 1 ]]; then compareidx_stage; fi
}

main "$@"
