#!/usr/bin/env bash
# DEV-ONLY scale-ladder measurement campaign (round-9 verdict #4):
# regenerates every ledger under scaling/ on the CURRENT code.
#
#   - per-key Bench at sf0.001 / sf0.01 / sf0.1 / sf0.3x: 3-rep
#     medians everywhere (round 8's sf0.3x column was single-rep;
#     growth-law verdicts at the decisive rung deserve medians);
#   - NEW sf1x rung (ScaleUp x10 of sf0.1, same decorrelation
#     discipline as sf0.3x): single-rep, clearly labeled — the bonus
#     column, not the decisive one;
#   - EngineLadder at every rung; at sf1x the three wedge-law engines
#     (ktruss_run, ra_run, jaccard_run) are EXCLUDED by name, not
#     silently: wedge/triangle volume grows with members^3, so the
#     1000x-sf0.1 wedge count puts them at tens of minutes to hours
#     (and the ktruss triangle table past the box's free disk) — the
#     quotient twins are the production answer at that shape, and the
#     sf0.3x rung already measures the general engines' growth law.
#
# Run from /root/repo. Writes scaling/bench_<rung>.json,
# scaling/engines.jsonl; refreshes BENCH_LOCAL.json at sf0.1.
set -euo pipefail
cd "$(dirname "$0")/.."
R=$(pwd)

# corpus guard: require EVERY table's _SUCCESS marker — checking only
# the last-written table would accept a torn corpus where an aborted
# REgeneration overwrote early tables but died before reaching the
# late ones (whose stale markers survive)
have_corpus() {
  for t in region nation customer supplier part orders lineitem events documents embeddings; do
    [ -f "$1/$t.parquet/_SUCCESS" ] || return 1
  done
}

echo "== scaleup sf0.3x (3x sf0.1)"
have_corpus /tmp/scale/sf0.3x || \
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/scale/sf0.3x 3" \
    > /tmp/campaign_scaleup_3x.log 2>&1

echo "== scaleup sf1x (10x sf0.1)"
have_corpus /tmp/scale/sf1x || \
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/scale/sf1x 10" \
    > /tmp/campaign_scaleup.log 2>&1

bench() { # rung dir reps out
  echo "== bench $1 (reps=$3)"
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_BENCH_OUT="$4" \
    sbt -batch "runMain graft.Bench --reps $3" \
    > "/tmp/campaign_bench_$1.log" 2>&1
  tail -c 600 "$4"; echo
}

ladder() { # rung dir reps extra-args
  echo "== engines $1 (reps=$3)"
  SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR="$2" \
    sbt -batch "runMain graft.tools.EngineLadder --reps $3 $4" \
    2> "/tmp/campaign_ladder_$1.log" | grep -E '^\{' >> "$R/scaling/engines.jsonl"
}

bench sf0.001 /root/testdata/sf0.001 3 "$R/scaling/bench_sf0.001.json"
bench sf0.01  /root/testdata/sf0.01  3 "$R/scaling/bench_sf0.01.json"
# sf0.1 is the committed regression record: let Bench's own guard
# write BENCH_LOCAL.json, then copy the ledger into scaling/
echo "== bench sf0.1 (reps=3, BENCH_LOCAL.json record)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench --reps 3" > /tmp/campaign_bench_sf0.1.log 2>&1
cp BENCH_LOCAL.json "$R/scaling/bench_sf0.1.json"
tail -c 600 "$R/scaling/bench_sf0.1.json"; echo
bench sf0.3x  /tmp/scale/sf0.3x      3 "$R/scaling/bench_sf0.3x.json"
bench sf1x    /tmp/scale/sf1x        1 "$R/scaling/bench_sf1x.json"

: > "$R/scaling/engines.jsonl"
ladder sf0.001 /root/testdata/sf0.001 3 ""
ladder sf0.01  /root/testdata/sf0.01  3 ""
ladder sf0.1   /root/testdata/sf0.1   3 ""
ladder sf0.3x  /tmp/scale/sf0.3x     3 ""
# --exclude derives the sf1x set from EngineLadder's registry minus
# the three wedge-law engines — an engine added to the registry later
# is measured here by default instead of silently dropped
ladder sf1x    /tmp/scale/sf1x       1 "--exclude ktruss_run,ra_run,jaccard_run"

echo "== campaign done"
