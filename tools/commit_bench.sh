#!/bin/sh
# Deliberate promotion of a bench record into the committed repo artifact.
#
# graft.Bench writes its full per-query JSON only to the env-pointed file
# (default /tmp/graft_bench.json) — never into the repo — because two
# rounds running, a contended run silently overwrote the committed clean
# record (r13 verdict #2). This script is the ONLY sanctioned write path
# to /root/repo/BENCH_PERQUERY.json: it refuses a record whose
# contention_index is above the clean threshold unless forced.
#
# Usage: tools/commit_bench.sh [record.json] [--force]
set -eu
DST="/root/repo/BENCH_PERQUERY.json"
THRESHOLD="1.5"
FORCE="no"
SRC=""
# first non-flag argument is the record path; flags may appear anywhere
for a in "$@"; do
  if [ "$a" = "--force" ]; then FORCE="yes"
  elif [ -z "$SRC" ]; then SRC="$a"
  else echo "unexpected argument: $a" >&2; exit 2; fi
done
[ -n "$SRC" ] || SRC="/tmp/graft_bench.json"
[ -f "$SRC" ] || { echo "no record at $SRC" >&2; exit 1; }
# path goes through argv, never interpolated into python source (quotes/spaces safe)
CI=$(python3 -c "import json,sys; print(json.load(open(sys.argv[1]))['contention_index'])" "$SRC")
NF=$(python3 -c "import json,sys; print(json.load(open(sys.argv[1]))['n_failed'])" "$SRC")
OK=$(python3 -c "print('yes' if float('$CI') <= $THRESHOLD else 'no')")
if [ "$NF" != "0" ] && [ "$FORCE" != "yes" ]; then
  echo "REFUSED: record has n_failed=$NF (pass --force to override)" >&2
  exit 1
fi
if [ "$OK" != "yes" ] && [ "$FORCE" != "yes" ]; then
  echo "REFUSED: contention_index $CI > $THRESHOLD — not a clean record (pass --force to override)" >&2
  exit 1
fi
cp "$SRC" "$DST"
echo "promoted $SRC -> $DST (contention_index=$CI, n_failed=$NF)"
