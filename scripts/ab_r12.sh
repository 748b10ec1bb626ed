#!/bin/bash
# Round-12 A/B driver for the symmetrize-with-explode theme.
# Usage: scripts/ab_r12.sh before|after
# Runs the touched faces in fixed batches (identical order both arms) so
# in-batch pressure cancels. Plan captures: the "before" arm only fills
# plans/r12/<q>_before.txt gaps (existing _before files are the
# round-start state and must not be overwritten); the "after" arm
# captures every touched face.
set -e
ARM="$1"
cd /root/repo
mkdir -p plans/r12
LOG="plans/r12/ab_${ARM}.log"
: > "$LOG"
ALL="q148_triangle_count q156_kcore_decomposition q157_bfs_levels q167_sssp_bounded \
q176_link_prediction q176b_link_prediction_capped q180_lpa_communities q204_personalized_pagerank \
q80_neardup_clusters q80b_neardup_clusters_star q173_incremental_clusters q107b_containment_budgeted \
q174_density_clusters q174b_density_clusters_production"

if [ "$ARM" = "before" ]; then
  # fill missing before-plans first (cheap, plan-only), then time
  MISSING=""
  for q in $ALL; do
    [ -f "plans/r12/${q}_before.txt" ] || MISSING="$MISSING $q"
  done
  if [ -n "$MISSING" ]; then
    python scripts/profile_queries.py $MISSING --runs 0 --no-warm \
      --plan-dir plans/r12 --plan-suffix before 2>>/tmp/ab_err.log | tee -a "$LOG"
  fi
  PLANARGS=""
else
  PLANARGS="--plan-dir plans/r12 --plan-suffix after"
fi

run() {
  python scripts/profile_queries.py "$@" --runs 3 $PLANARGS 2>>/tmp/ab_err.log | tee -a "$LOG"
}
run q148_triangle_count q156_kcore_decomposition q157_bfs_levels q167_sssp_bounded
run q176_link_prediction q176b_link_prediction_capped q180_lpa_communities q204_personalized_pagerank
run q80_neardup_clusters q80b_neardup_clusters_star q173_incremental_clusters q107b_containment_budgeted
run q174_density_clusters q174b_density_clusters_production
echo "=== $ARM done ==="
