#!/bin/bash
# Reference parity: script/paraB/micro24_B_hadd.sh <cluster>
# (set B: N=65536 maxLevel=45 alpha=15; sweeps level 45..2 into outLogs/)
source "$(dirname "$0")/../common.sh"
run_set_op B hadd 45 15 65536 "${1:-1}"
