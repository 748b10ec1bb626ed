#!/bin/bash
# Round-13 A/B driver: Arrow fold scorer (kNN/density), packed
# co-occurrence/wedge keys (graph), shingle-set parquet (MinHash family).
# Usage: scripts/ab_r13.sh before|after [SF_DIR]
# Runs the touched faces in fixed batches (identical order both arms) so
# in-batch pressure cancels; before-arm fills missing before-plans only.
set -e
ARM="$1"
SF="${2:-/root/testdata/sf0.1}"
TAG=""
case "$SF" in *replica*|*10x*) TAG="_10x";; esac
cd /root/repo
mkdir -p plans/r13
LOG="plans/r13/ab_${ARM}${TAG}.log"
: > "$LOG"
ALL="q169_knn_graph q169b_knn_graph_production q174_density_clusters q174b_density_clusters_production \
q176_link_prediction q176b_link_prediction_capped q148_triangle_count q156_kcore_decomposition \
q180_lpa_communities q36_minhash_lsh_neardup q36b_minhash_production q80_neardup_clusters \
q80b_neardup_clusters_star q173_incremental_clusters"

if [ "$ARM" = "before" ]; then
  MISSING=""
  for q in $ALL; do
    [ -f "plans/r13/${q}_before.txt" ] || MISSING="$MISSING $q"
  done
  if [ -n "$MISSING" ]; then
    python scripts/profile_queries.py $MISSING --runs 0 --no-warm \
      --plan-dir plans/r13 --plan-suffix before 2>>/tmp/ab_r13_err.log | tee -a "$LOG"
  fi
  PLANARGS=""
else
  PLANARGS="--plan-dir plans/r13 --plan-suffix after"
fi
# plans are captured at sf0.1 only; a replica arm must not overwrite them
[ -n "$TAG" ] && PLANARGS=""

run() {
  python scripts/profile_queries.py "$@" --sf "$SF" --runs 3 $PLANARGS 2>>/tmp/ab_r13_err.log | tee -a "$LOG"
}
run q169_knn_graph q169b_knn_graph_production q174_density_clusters q174b_density_clusters_production
run q176_link_prediction q176b_link_prediction_capped q148_triangle_count q156_kcore_decomposition
run q180_lpa_communities q36_minhash_lsh_neardup q36b_minhash_production
run q80_neardup_clusters q80b_neardup_clusters_star q173_incremental_clusters
echo "=== $ARM $SF done ==="
