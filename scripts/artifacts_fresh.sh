#!/usr/bin/env bash
# Staleness check for a round's committed artifacts (r13 verdict #2:
# PARITY_r13 pinned one commit too early and nobody noticed).
#
# Usage: scripts/artifacts_fresh.sh <N>
#
# Reads ARTIFACTS_r{N}.json's pinned commit and lists every commit
# SINCE it that touches runtime query code-paths (src/main or
# build.sbt — tests cannot change what the artifacts measured) OR
# the measurement machinery itself (scripts/bench*.sh,
# scripts/bench_fold.py, scripts/planaudit* — r14 advice: editing
# the fold/bench scripts after the pin changes what a committed
# BENCH artifact MEANS without touching src). Any hit means the
# round's parity/planaudit/bench evidence no longer describes the
# shipped code: exit 1 and say so — rerun
# scripts/round_artifacts.sh at the new final query-touching commit.
set -euo pipefail
N=${1:?usage: artifacts_fresh.sh <N>}
cd "$(dirname "$0")/.."
stamp="ARTIFACTS_r${N}.json"
if [[ ! -f "$stamp" ]]; then
  echo "STALE: no $stamp — round $N artifacts were never pinned" >&2
  exit 1
fi
pinned=$(python3 -c "import json;print(json.load(open('$stamp'))['commit'])")
if ! git cat-file -e "$pinned^{commit}" 2>/dev/null; then
  echo "STALE: pinned commit $pinned not found in this repo" >&2
  exit 1
fi
later=$(git log --oneline "$pinned..HEAD" -- src/main build.sbt \
  scripts/bench.sh scripts/bench_fold.py scripts/round_artifacts.sh)
if [[ -n "$later" ]]; then
  echo "STALE: commits touching src/main, build.sbt, or the bench/fold"
  echo "scripts after the pinned artifact commit ${pinned:0:9} — rerun"
  echo "scripts/round_artifacts.sh $N:"
  echo "$later"
  exit 1
fi
echo "FRESH: round $N artifacts pin ${pinned:0:9}; no query-touching commits since"
