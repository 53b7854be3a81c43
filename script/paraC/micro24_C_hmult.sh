#!/bin/bash
# Reference parity: script/paraC/micro24_C_hmult.sh <cluster>
# (set C: N=65536 maxLevel=24 alpha=6; sweeps level 24..2 into outLogs/)
source "$(dirname "$0")/../common.sh"
run_set_op C hmult 24 6 65536 "${1:-1}"
