#!/bin/bash
# Round-5 multi-scene benchmark sweeps (VERDICT r4 tasks 2, 6, 8).
# Sequences every quality run on the one chip and appends JSON lines to
# $OUT (default /tmp/round5_sweeps.jsonl) — safe to interrupt and re-run;
# finished (name, scene) pairs are skipped.
set -u
cd "$(dirname "$0")/.."
OUT="${OUT:-/tmp/round5_sweeps.jsonl}"
touch "$OUT"

run_h2h () {  # name scene extra-args...
  local name="$1"; local scene="$2"; shift 2
  if grep -q "\"name\": \"${name}@${scene}\"" "$OUT"; then
    echo "skip ${name}@${scene}"; return
  fi
  echo "=== head_to_head ${name} on ${scene} $*"
  python scripts/head_to_head.py --name "${name}@${scene}" \
    --scene "$scene" "$@" 2>&1 \
    | grep -E '^\{' | tee -a "$OUT"
}

STATIC_SCENES="${STATIC_SCENES:-proceduralopaque proceduraltextured proceduralthin proceduralmixed procedural}"

# fast families first (full static coverage in ~10 min)
for s in $STATIC_SCENES; do
  run_h2h cp-default "$s"
done
for s in $STATIC_SCENES; do
  run_h2h plane128 "$s" --plane_res 128 --plane_rank 32
  run_h2h tensorf "$s" --field tensorf
  run_h2h voxel "$s" --field voxel
done
# hash parity path last (~30 min/scene)
if [ "${RUN_HASH:-1}" = "1" ]; then
  for s in $STATIC_SCENES; do
    run_h2h hash "$s" --field ngp
  done
fi
echo "done; results in $OUT"
