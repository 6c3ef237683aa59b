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

# Collapse-mechanism A/B: cp+plane128 die on opaque, plane128+tensorf on
# textured, all between steps 1000-2500.  If exact sampling (above) does
# NOT fix it, the suspect is an un-clipped Adam update spike (the shipping
# scripts run without grad_clip too, but at 2^18 budgets / dynamic rays).
run_h2h cp-clip1 proceduralopaque 900 --grad_clip 1.0
run_h2h plane128-clip1 proceduraltextured 900 --grad_clip 1.0 \
  --plane_res 128 --plane_rank 32
run_h2h tensorf-clip1 proceduraltextured 900 --grad_clip 1.0 --field tensorf
# lower-lr control on one collapsing combo (is it just lr 1e-2?)
run_h2h cp-lr3e3 proceduralopaque 900 --lr 3e-3

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
# K-Planes collapse mechanism: the sweep's --log_plane_norms run piped
# its instrumentation lines away; rerun capturing everything.
if ! [ -f /tmp/kplanes_norms.log ]; then
  echo "=== kplanes norm-instrumented rerun"
  timeout 1200 python examples/train_mlp_tnerf.py --scene proceduraldynamic \
    --max_steps 10000 --log_every 500 --field kplanes \
    --field_reg_weight 1e-4 --log_plane_norms 2>&1 \
    | tee /tmp/kplanes_norms.log | tail -3
fi
echo done
