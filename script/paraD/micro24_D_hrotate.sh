#!/bin/bash
# Reference parity: script/paraD/micro24_D_hrotate.sh <cluster>
# (set D: N=65536 maxLevel=26 alpha=9; sweeps level 26..2 into outLogs/)
source "$(dirname "$0")/../common.sh"
run_set_op D hrotate 26 9 65536 "${1:-1}"
