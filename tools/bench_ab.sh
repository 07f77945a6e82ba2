#!/usr/bin/env bash
# Cross-round bench A/B: adjudicate a claimed round-over-round delta by
# benching a PRIOR git ref in a detached worktree on the SAME machine in
# the SAME session, interleaved with the working tree — the only protocol
# under which a >25% cross-round artifact delta is actionable (artifact
# numbers from different rounds embed machine drift; see SCALE.md §8b).
#
# Usage: tools/bench_ab.sh <ref> [sfDir] [queryFilter] [reps]
#   tools/bench_ab.sh HEAD~5 /root/testdata/sf0.1 q82,q87 5
#
# Prints two labelled JSON bench lines (A = working tree, B = <ref>).
# The worktree is removed on exit.
set -euo pipefail
REF="${1:?usage: bench_ab.sh <ref> [sfDir] [queryFilter] [reps]}"
SF="${2:-/root/testdata/sf0.1}"
QUERIES="${3:-}"
REPS="${4:-5}"
ROOT="$(git rev-parse --show-toplevel)"
WT="$(mktemp -d /tmp/graft_ab.XXXXXX)"
cleanup() { git -C "$ROOT" worktree remove --force "$WT" 2>/dev/null || true; }
trap cleanup EXIT
git -C "$ROOT" worktree add --detach "$WT" "$REF" >/dev/null

run_bench() { # dir label
  local out
  # env(1) so the optionally-expanded SPARK_GRAFT_QUERIES word is an
  # assignment, not a command (expanded VAR=val words are never parsed
  # as shell assignments)
  out="$( cd "$1" &&
    env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_REPS="$REPS" \
    SPARK_GRAFT_BENCH_OUT=/dev/null \
    ${QUERIES:+SPARK_GRAFT_QUERIES="$QUERIES"} \
    sbt -batch "runMain graft.Bench" 2>&1 )" || true
  local line
  line="$(printf '%s\n' "$out" | grep '"metric"' | sed 's/^\[info\] //' || true)"
  if [ -z "$line" ]; then
    # don't die silently (a concurrent sbt holding the project lock is
    # the classic cause) — surface the tail and fail loudly
    printf '%s\n' "$out" | tail -5 >&2
    echo "bench_ab: no metric line from $2 — is another sbt running?" >&2
    exit 2
  fi
  printf '%s %s\n' "$2" "$line"
}

# Interleave so slow machine drift hits both sides: B first warms the
# JVM caches equally often as A across the two passes.
run_bench "$WT"   "B[$REF]"
run_bench "$ROOT" "A[worktree]"
run_bench "$WT"   "B[$REF]"
run_bench "$ROOT" "A[worktree]"
