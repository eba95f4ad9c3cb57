#!/bin/bash
# Alternating binary A/B: q_dedup_minhash watch row (r13 PLANS.md), q_pagerank control.
set -u
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() {
  java -Xmx8g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$1:/opt/spark/jars/*" graft.QProbe /root/testdata/sf0.1 3 q_dedup_minhash,q_pagerank 2>/dev/null | grep qprobe
}
for round in 1 2; do
  echo "== round $round HEAD(r13)"; run /root/repo/target/scala-2.13/classes
  echo "== round $round r12";       run /root/repo/wt_r12/target/scala-2.13/classes
done
