#!/bin/bash
# Round-15 board item 3 (tail): the same-JVM sharded-vs-clamped fit at
# sf5 — the judge's "Done" criterion for the shard tier. ONE JVM,
# alternating arms (ABAB + a warm repeat of each), default cap
# (CMAX=4096), so:
#   n4096 = e8b's ladder CLAMPED at the cap (the regime round 14
#           measured at 491.0/417.7 s, candidates 137.2M)
#   s4096 = the e8c shard tier at the same cap (K=2, per-shard 125k ->
#           per-shard C=4096 UN-clamped, candidates within-shard)
# plus an unclamped sf2 control pair (K=1 there: sharding overhead ~ 0).
cd /root/repo
set -o pipefail
OUT=target/shardfit_r15.txt
: > $OUT
echo "=== same-JVM sharded-vs-clamped fit (default CMAX=4096), sf2 control + sf5 ABAB" >> $OUT
sbt -batch "Test/runMain graft.E8Probe /root/repo/target/sf5 n1024@/root/repo/target/sf0.5,n4096@/root/repo/target/sf2,s4096@/root/repo/target/sf2,n4096@/root/repo/target/sf5,s4096@/root/repo/target/sf5,n4096@/root/repo/target/sf5,s4096@/root/repo/target/sf5" 2>&1 | grep -E "e8probe|\[graft\]" >> $OUT
echo SHARDFIT_DONE >> $OUT
