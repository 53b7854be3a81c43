#!/bin/bash
# Run all operations for set B (reference script/paraB/run.sh parity).
cd "$(dirname "$0")"
for op in hmult hadd hrotate pmult padd; do
  bash micro24_B_${op}.sh "${1:-1}" || exit 1
done
