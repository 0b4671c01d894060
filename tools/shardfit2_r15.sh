#!/bin/bash
# Round-15 (second half): the same-JVM clamped-vs-sharded fit for the
# OTHER two shard-tier operators, mirroring shardfit_r15.sh's ABAB
# methodology. ONE JVM, default cap (CMAX=4096):
#   m4096 = e16b's decontam ladder CLAMPED at the cap (ivfDecontam at
#           the explicit C the default config pins above 131k vectors)
#   q4096 = the e16c shard tier at the same cap (K=2 at sf5, per-shard
#           C=4096 UN-clamped, eval replicated)
#   y0    = e18 exactly as the catalog runs it (scaledC clamped at the
#           default cap at sf5 — the composed pipeline's clamp regime)
#   x4096 = the e18c sharded composition at the same cap
# plus a warmup point and an unclamped sf2 control pair (K=1 there:
# sharding overhead ~ 0). Run with the box otherwise idle (pause any
# co-tenant DuckDB with SIGSTOP first — the d17 bandwidth lesson).
cd /root/repo
set -o pipefail
OUT=target/shardfit2_r15.txt
: > $OUT
echo "=== same-JVM clamped-vs-sharded fit for decontam (m/q) and the composed pipeline (y/x), default CMAX=4096" >> $OUT
sbt -batch "Test/runMain graft.E8Probe /root/repo/target/sf5 m1024@/root/repo/target/sf0.5,m4096@/root/repo/target/sf2,q4096@/root/repo/target/sf2,m4096@/root/repo/target/sf5,q4096@/root/repo/target/sf5,m4096@/root/repo/target/sf5,q4096@/root/repo/target/sf5,y0@/root/repo/target/sf5,x4096@/root/repo/target/sf5,y0@/root/repo/target/sf5,x4096@/root/repo/target/sf5" 2>&1 | grep -E "e8probe|\[graft\]" >> $OUT
echo SHARDFIT2_DONE >> $OUT
