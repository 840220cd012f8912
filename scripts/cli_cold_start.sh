#!/bin/bash
# CLI cold-start A/B: persistent XLA compilation cache (utils/compcache.py).
#
# Runs the SAME CLI command three times in fresh processes against the real
# chip:
#   1. cold   — empty cache dir (all XLA compiles from scratch)
#   2. cached — same dir, so every >=5s compile is served from disk
#   3. cached2 — repeat to show the cached time is stable
# Wall-clock includes interpreter + axon tunnel registration (~5-85 s,
# CLAUDE.md), so the honest number is the DELTA cold-cached, not the ratio.
#
# Usage: bash scripts/cli_cold_start.sh [outfile]
set -u
OUT=${1:-/root/repo/CLI_COLD_START_r05.json}
DIR=$(mktemp -d /tmp/jc_coldstart.XXXX)
CMD=(python -m diffusion_image_editing_tpu.cli generate --family ddpm
     --steps 10 --num-images 1 --out-prefix /tmp/cli_cold_gen)

run() {
  local t0 t1
  t0=$(date +%s.%N)
  JAX_COMPILATION_CACHE_DIR="$DIR" "${CMD[@]}" >/dev/null 2>&1
  local rc=$?
  t1=$(date +%s.%N)
  [ $rc -ne 0 ] && echo "run failed rc=$rc" >&2 && exit $rc
  echo "$t1 $t0" | awk '{printf "%.1f", $1-$2}'
}

cold=$(run)
cached=$(run)
cached2=$(run)
n=$(ls "$DIR" | wc -l)
cat > "$OUT" <<EOF
{
  "program": "cli generate --family ddpm --steps 10 (256px DDPM UNet scan, real chip)",
  "cold_s": $cold,
  "cached_s": $cached,
  "cached2_s": $cached2,
  "cache_entries": $n,
  "note": "wall-clock includes interpreter start + axon tunnel registration (5-85 s variable); compile savings = cold - cached"
}
EOF
cat "$OUT"
rm -rf "$DIR"
