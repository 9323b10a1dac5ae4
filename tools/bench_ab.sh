#!/bin/bash
# Split-catalog A/B attribution runs (round 8, verdict task #1b).
# Three fresh JVMs: full catalog, half1, half2 — same flags sbt `run` uses.
set -e
cd /root/repo
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
run_one() {
  local tag="$1"; local filter="$2"
  echo "=== bench $tag (filter=${filter:-none}) ==="
  if [ -n "$filter" ]; then export SPARK_GRAFT_BENCH_QUERIES="$filter"; else unset SPARK_GRAFT_BENCH_QUERIES; fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Duser.timezone=UTC -Xmx8g -cp "$CP" graft.Bench > /tmp/bench_$tag.log 2>&1
  cp bench_out.json /tmp/bench_ab_$tag.json
  tail -1 /tmp/bench_$tag.log | head -c 300; echo
}
# full runs LAST so the bench_out.json left in the working tree is the
# full-catalog record, never a half-subset one (the repo commits that file
# as "the committed bench record")
run_one half1 "half1"
run_one half2 "half2"
run_one full ""
echo "=== AB DONE ==="
