#!/bin/bash
# Reference parity: script/paraA/micro24_A_padd.sh <cluster>
# (set A: N=32768 maxLevel=28 alpha=28; sweeps level 28..2 into outLogs/)
source "$(dirname "$0")/../common.sh"
run_set_op A padd 28 28 32768 "${1:-1}"
