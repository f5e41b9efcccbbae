#!/bin/sh
# End-of-round persistent-cache regeneration (VERDICT r4 item 6).
#
# The committed .jax_cache only pays for itself if the DRIVER's bench
# run hits it — which requires the cache to be snapshotted AFTER the
# last change to any code on the step path (round 4 committed the
# snapshot mid-round, the step program changed afterwards, and the
# driver paid a 182 s cache-miss compile).  Run this when the tree is
# final:
#
#   sh benchmarks/cache_regen.sh
#
# It (1) wipes the cache directories, (2) runs bench.py cold to
# regenerate the freeze pickle + exactly the cache entries the driver's
# run needs, (3) runs bench.py again to prove the warm path
# (one_time_total target: <= 90 s), then leaves git staging to the
# operator.
set -e
cd "$(dirname "$0")/.."

echo "== wiping caches =="
rm -rf .jax_cache .freeze_cache
mkdir -p .jax_cache .freeze_cache

echo "== cold run (regenerates freezes + compile cache) =="
BENCH_DEADLINE_S=1500 python bench.py

echo "== warm run (driver path; expect one_time_total_s <= 90) =="
BENCH_DEADLINE_S=820 python bench.py

echo "== cache sizes =="
du -sh .jax_cache .freeze_cache
ls .jax_cache | wc -l
