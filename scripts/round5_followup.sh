#!/bin/bash
# Round-5 follow-up diagnostics: the opaque-scene collapse under the
# head-to-head protocol (fp4 APPROXIMATE sampling).  Both cp and plane128
# died to a pure-white render (13.37 = PSNR of white vs the test split)
# between steps 1k-2.5k — field-independent, so the sampling/occupancy
# loop is the suspect.  A/B the fine-phase exactness on the same protocol:
#   fp4  = 4 run-start probes (approximate; false samples) — the collapse
#   fp-1 = box-27 (exact, the shipping default)
#   fp8  = 8 run-start probes (exact, pre-box formulation)
set -u
cd "$(dirname "$0")/.."
OUT="${OUT:-/tmp/round5_sweeps.jsonl}"
touch "$OUT"
have () { grep -q "\"name\": \"$1\"" "$OUT"; }
run_h2h () {
  local name="$1"; local scene="$2"; local tmo="$3"; shift 3
  if have "${name}@${scene}"; then echo "skip ${name}@${scene}"; return; fi
  echo "=== head_to_head ${name} on ${scene} $*"
  timeout "$tmo" python scripts/head_to_head.py --name "${name}@${scene}" \
    --scene "$scene" "$@" 2>&1 | grep -E '^\{' | tail -1 | tee -a "$OUT"
}

run_h2h cp-fpbox proceduralopaque 900 --fine_probes -1
run_h2h cp-fp8 proceduralopaque 900 --fine_probes 8
run_h2h plane128-fpbox proceduralopaque 900 --fine_probes -1 \
  --plane_res 128 --plane_rank 32
# does exact sampling change the non-opaque rows? (one control)
run_h2h cp-fpbox procedural 900 --fine_probes -1

# tensorf crashed on textured (before checkpoint 500) and thin (after
# 500) in the main sweep — rerun with FULL output captured
for s in proceduraltextured proceduralthin; do
  # NOTE: match the FINAL record ("results": [...]), not the stray
  # per-checkpoint line the crashed thin run left behind
  if ! grep -q "\"name\": \"tensorf@${s}\", \"params\"" "$OUT"; then
    echo "=== tensorf rerun on ${s} (full log)"
    timeout 900 python scripts/head_to_head.py --name "tensorf@${s}" \
      --scene "$s" --field tensorf 2>&1 | tee /tmp/tensorf_${s}.log \
      | grep -E '^\{' | tail -1 | tee -a "$OUT"
  fi
done
echo done
