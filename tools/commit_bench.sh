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
#
# Two independent gates (r17 verdict #1): the MEDIAN contention_index must
# be <= 1.5, AND every SINGLE control's median must sit <= 2x its committed
# ref. The second gate exists because a median-of-3 contention_index can
# mask one diffusely-elevated control (r17's promoted record carried
# ctl_cpu at 2.4x ref behind a 1.13 median, and normalized_total swung 19%
# between two same-code records as a result).
set -eu
DST="/root/repo/BENCH_PERQUERY.json"
THRESHOLD="1.5"
PER_CONTROL_MAX="2.0"
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
# per-control gate: every control's median must be <= PER_CONTROL_MAX x its
# ref — the median contention_index under-corrects a single elevated control.
BAD=$(python3 -c "
import json, sys
rec = json.load(open(sys.argv[1]))
cap = float(sys.argv[2])
bad = []
for name, c in sorted(rec.get('controls', {}).items()):
    ratio = c['median'] / c['ref']
    if ratio > cap:
        bad.append('%s %.2f (median %.3f vs ref %.3f)' % (name, ratio, c['median'], c['ref']))
print('; '.join(bad))
" "$SRC" "$PER_CONTROL_MAX")
if [ -n "$BAD" ] && [ "$FORCE" != "yes" ]; then
  echo "REFUSED: control(s) above ${PER_CONTROL_MAX}x ref: $BAD (pass --force to override)" >&2
  exit 1
fi
cp "$SRC" "$DST"
echo "promoted $SRC -> $DST (contention_index=$CI, n_failed=$NF)"
