#!/bin/bash
# Reference parity: script/motivation/micro24_motivation.sh <cluster>
# (set-A limb structure maxLevel=28/alpha=28 on the N=2^16 config — the
# "M" parameter set; hmult at every level 28..2)
source "$(dirname "$0")/../common.sh"
run_set_op M hmult 28 28 65536 "${1:-1}"
