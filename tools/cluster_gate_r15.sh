#!/bin/bash
# Round-15 board item 1 (tail): the cluster CMAX gate's ORACLE compare.
# Re-dumps the scaled e-family (e2b/e8b/e16b/e18/e8c) at sf3 and sf5
# with SPARK_GRAFT_IVF_CMAX=16384 under local-cluster[2,16,12288]
# (2 real executor JVMs, 12 GiB heaps via SPARK_EXECUTOR_MEMORY — the
# master string's third field is the WORKER allocation, not the JVM
# -Xmx), then runs tools/check.py over each dump. The full stderr log
# is kept so the task-binary grep (zero large-task-binary warnings
# after IvfProbes2B's codebook broadcast) reads from the same run.
set -u
cd /root/repo
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAR=target/scala-2.13/bigbugdataspark_2.13-0.1.0.jar
QUERIES="e2b_ann_lsh_scaled e8b_embed_dedup_scaled e16b_decontam_scaled e18_e2e_vector_pipeline e8c_embed_dedup_sharded"
for SF in sf3 sf5; do
  OUT=target/vclu_$SF
  rm -rf "$OUT"
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER='local-cluster[2,16,12288]' \
  SPARK_EXECUTOR_MEMORY=12g \
  SPARK_GRAFT_JARS=$JAR \
  SPARK_GRAFT_IVF_CMAX=16384 SPARK_GRAFT_CPUS=32 \
  java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx24g -cp "$JAR:/opt/spark/jars/*" \
    graft.Verify /root/repo/target/$SF "$OUT" $QUERIES \
    > target/vclu_${SF}.log 2>&1
  echo "VERIFY_${SF}_RC=$?"
done
echo CLUSTER_DUMPS_DONE
