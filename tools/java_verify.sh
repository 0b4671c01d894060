#!/bin/bash
# Plain-java Verify runner — same JVM flags as build.sbt's forked run
# (jdk17 add-opens, UTC, UI off), no sbt project lock, so correctness
# dumps can run beside an sbt test session. Usage:
#   tools/java_verify.sh <sfDir> <outDir> [query ...]
# Env passthrough: SPARK_GRAFT_* (CPUS, IVF_CMAX, LSH_PMAX, MASTER,
# JARS, SKIP), SPARK_DRIVER_MEM (default 32g).
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
# SPARK_EXTRA_OPTS: extra -Dspark.* session configs (SparkConf loads
# spark.* system properties), e.g. a raised autoBroadcastJoinThreshold
# for the didactic e8 entry at sf1 whose 26 MB vector side otherwise
# plans a sort-merge join with a ~160 GB sort spill (> this box's disk).
exec java $ADDOPENS ${SPARK_EXTRA_OPTS:-} -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" -cp "$JAR:/opt/spark/jars/*" \
  graft.Verify "$@"
