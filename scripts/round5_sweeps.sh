#!/bin/bash
# Round-5 multi-scene benchmark sweeps (VERDICT r4 tasks 2, 4, 5, 6, 8).
# Sequences every quality run on the one chip and appends JSON lines to
# $OUT (default /tmp/round5_sweeps.jsonl) — safe to interrupt and re-run;
# finished (name) keys are skipped.  Phases gate via env:
#   STATIC=1 DYNAMIC=1 KPLANES=1 BARF=1 OPAQUE=1 RUN_HASH=1
set -u
cd "$(dirname "$0")/.."
OUT="${OUT:-/tmp/round5_sweeps.jsonl}"
touch "$OUT"

have () { grep -q "\"name\": \"$1\"" "$OUT"; }

run_h2h () {  # name scene timeout extra-args...
  local name="$1"; local scene="$2"; local tmo="$3"; shift 3
  if have "${name}@${scene}"; then echo "skip ${name}@${scene}"; return; fi
  echo "=== head_to_head ${name} on ${scene} $*"
  timeout "$tmo" python scripts/head_to_head.py --name "${name}@${scene}" \
    --scene "$scene" "$@" 2>&1 | grep -E '^\{' | tail -1 | tee -a "$OUT"
}

run_dyn () {  # name scene timeout extra-args... (train_mlp_tnerf)
  local name="$1"; local scene="$2"; local tmo="$3"; shift 3
  if have "$name"; then echo "skip ${name}"; return; fi
  echo "=== tnerf-family ${name} on ${scene} $*"
  timeout "$tmo" python examples/train_mlp_tnerf.py --scene "$scene" \
    --max_steps 10000 --log_every 2500 "$@" 2>&1 \
    | grep -E '^\{' | tail -1 \
    | python -c "import sys,json;
l=sys.stdin.readline().strip()
if l:
    d=json.loads(l); d['name']='$name'; print(json.dumps(d))" \
    | tee -a "$OUT"
}

run_barf () {  # name timeout extra-args...
  local name="$1"; local tmo="$2"; shift 2
  if have "$name"; then echo "skip ${name}"; return; fi
  echo "=== barf ${name} $*"
  timeout "$tmo" python examples/train_barf.py --max_steps 10000 \
    --log_every 2500 "$@" 2>&1 | grep -E '^\{' | tail -1 \
    | python -c "import sys,json;
l=sys.stdin.readline().strip()
if l:
    d=json.loads(l); d['name']='$name'; print(json.dumps(d))" \
    | tee -a "$OUT"
}

run_occ () {  # name scene steps timeout extra-args... (train_ngp_nerf_occ)
  local name="$1"; local scene="$2"; local steps="$3"; local tmo="$4"; shift 4
  if have "$name"; then echo "skip ${name}"; return; fi
  echo "=== occ ${name} on ${scene} ${steps} steps $*"
  timeout "$tmo" python examples/train_ngp_nerf_occ.py --scene "$scene" \
    --max_steps "$steps" --log_every 2500 "$@" 2>&1 \
    | grep -E 'evaluation:' | tail -1 \
    | python -c "import sys,json,re
l=sys.stdin.readline()
m=re.search(r'psnr_avg=([\d.]+) ssim_avg=([\d.]+)', l)
if m: print(json.dumps({'name':'$name','psnr':float(m.group(1)),'ssim':float(m.group(2))}))" \
    | tee -a "$OUT"
}

STATIC_SCENES="${STATIC_SCENES:-proceduralopaque proceduraltextured proceduralthin proceduralmixed procedural}"

if [ "${STATIC:-1}" = "1" ]; then
  for s in $STATIC_SCENES; do
    run_h2h cp-default "$s" 900
  done
  for s in $STATIC_SCENES; do
    run_h2h plane128 "$s" 900 --plane_res 128 --plane_rank 32
    run_h2h tensorf "$s" 900 --field tensorf
    run_h2h voxel "$s" 900 --field voxel
  done
fi

if [ "${DYNAMIC:-1}" = "1" ]; then
  for s in proceduraldynamic procedurallocaldyn; do
    run_dyn "tnerf@$s" "$s" 1200 --field tnerf
    run_dyn "kplanes@$s" "$s" 1200 --field kplanes
    run_dyn "tineuvox@$s" "$s" 1200 --field tineuvox --lr 5e-3
  done
fi

if [ "${KPLANES:-1}" = "1" ]; then
  # stability family (VERDICT r4 task 5) on the smooth dynamic scene:
  # the raw product collapses at TV 1e-4 by 10k (round-4 measured) —
  # can the bounded activation hold at TV 1e-4 and TV 0?
  run_dyn "kplanes-tanh-tv1e4@dyn" proceduraldynamic 1200 \
    --field kplanes --plane_activation tanh --field_reg_weight 1e-4
  run_dyn "kplanes-tanh-tv0@dyn" proceduraldynamic 1200 \
    --field kplanes --plane_activation tanh --field_reg_weight 0.0
  run_dyn "kplanes-amp-tv1e4@dyn" proceduraldynamic 1200 \
    --field kplanes --amp_prior 10.0 --field_reg_weight 1e-4
  # instrumented raw baseline at the collapsing TV (plane norms logged to
  # the sweep stdout log for the mechanism writeup)
  run_dyn "kplanes-raw-tv1e4@dyn" proceduraldynamic 1200 \
    --field kplanes --field_reg_weight 1e-4 --log_plane_norms
fi

if [ "${BARF:-1}" = "1" ]; then
  # with the f32 pose-math fix (models/pose.py) — the round-4 ~0.93 deg
  # rotation floor was bf16 quantization
  run_barf "barf-10k-fixedprec" 2400
fi

if [ "${OPAQUE:-1}" = "1" ]; then
  run_occ "opaque-10k" proceduralopaque 10000 1200
  run_occ "opaque-20k" proceduralopaque 20000 2400
  run_occ "opaque-10k-stripes4" proceduralopaque 10000 1200 --occ_stripes 4
fi

# hash parity path last (~30 min/scene)
if [ "${RUN_HASH:-1}" = "1" ]; then
  for s in $STATIC_SCENES; do
    run_h2h hash "$s" 3000 --field ngp
  done
fi
echo "done; results in $OUT"
