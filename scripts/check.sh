#!/bin/bash
# Run Verify at sf0.01 then the DuckDB oracle compare (driver t2 mimic).
set -e -o pipefail
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -Ev '^\[info\]' | tail -20
python3 scripts/check.py "$SF" "$OUT"
