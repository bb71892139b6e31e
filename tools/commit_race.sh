#!/bin/bash
# Two-PROCESS commit race (X96; BASELINE.md "Two-process commit race"):
# separate writer JVMs race rename-as-commit on ONE table log — the
# process-isolation upgrade over ManifestSpec's thread barriers, matching
# the reference's parallel per-account spark-submits (apify_dag.py:83-91).
#
# Usage:  sbt compile   # classes dir is the classpath (local master only)
#         tools/commit_race.sh [rounds=8] [repeats=5]
#
# Each repeat runs TWO races on fresh tables:
#   1. append/append: writers a+b, then check-append (ManifestSpec
#      assertions: per-writer versions strictly increase, union contiguous,
#      no lost row; prints handoffs = adjacent versions changing writers).
#   2. append/delete: writer a appends while writer d deletes seeded even
#      ids — order-independent final state, checked exactly.
# Writers poll a start flag written only after both JVMs are up, so the
# commit loops genuinely overlap.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUNDS=${1:-8}
REPEATS=${2:-5}
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first" >&2; exit 1; }
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="$CLASSES:/opt/spark/jars/*"
run() { # shellcheck disable=SC2086
  java $OPENS -Xmx2g -Dspark.ui.enabled=false -cp "$CP" graft.CommitRace "$@"
}

for i in $(seq 1 "$REPEATS"); do
  echo "=== repeat $i/$REPEATS: append/append ($ROUNDS rounds each) ==="
  DIR=$(mktemp -d /tmp/graft_race_aa.XXXXXX)/t
  START="$DIR.start"
  run seed "$DIR"
  run append "$DIR" a "$ROUNDS" "$START" > "$DIR.a.log" 2>&1 &
  PA=$!
  run append "$DIR" b "$ROUNDS" "$START" > "$DIR.b.log" 2>&1 &
  PB=$!
  sleep 1; touch "$START"   # both JVMs are booting; fire the gun
  wait $PA || { echo "writer a FAILED"; tail -5 "$DIR.a.log"; exit 1; }
  wait $PB || { echo "writer b FAILED"; tail -5 "$DIR.b.log"; exit 1; }
  run check-append "$DIR" "$ROUNDS" 2>&1 | grep RACE

  echo "=== repeat $i/$REPEATS: append/delete ==="
  DIR=$(mktemp -d /tmp/graft_race_ad.XXXXXX)/t
  START="$DIR.start"
  DROUNDS=$(( ROUNDS < 5 ? ROUNDS : 5 ))
  run seed "$DIR"
  run append "$DIR" a "$ROUNDS" "$START" > "$DIR.a.log" 2>&1 &
  PA=$!
  run delete "$DIR" "$DROUNDS" "$START" > "$DIR.d.log" 2>&1 &
  PD=$!
  sleep 1; touch "$START"
  wait $PA || { echo "appender FAILED"; tail -5 "$DIR.a.log"; exit 1; }
  wait $PD || { echo "deleter FAILED"; tail -5 "$DIR.d.log"; exit 1; }
  run check-appdel "$DIR" "$ROUNDS" "$DROUNDS" 2>&1 | grep RACE
done
echo "commit_race: all $REPEATS repeats passed"
