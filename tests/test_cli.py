"""CLI contract tests (reference bench_micro24 positional parity).

In-process `cli.main()` calls on the tiny config; conftest already pinned
the CPU backend with 8 virtual devices, so the optional [cluster]
positional exercises both real dispatch layers (shard_map+Pallas and
GSPMD). Every run goes through `--verify` (full-slot decrypt check) —
a latency print alone would pass on wrong results.
"""

import pytest

from homulator_tpu import cli

CFG = "configs/tiny.cfg"


@pytest.mark.parametrize(
    "op", ["hadd", "hsub", "pmult", "padd", "hmult", "hrotate", "hsquare"]
)
def test_cli_single_chip_ops_verify(op, capsys):
    rc = cli.main(["run", CFG, op, "8", "4", "4", "--verify", "--iters", "1"])
    outp = capsys.readouterr().out
    assert rc == 0, outp
    assert "verify max-abs-err" in outp


@pytest.mark.parametrize("op,expect", [
    ("hmult", "dispatch=shard_map+pallas"),
    ("hrotate", "dispatch=shard_map+pallas"),
    ("hadd", "dispatch=gspmd"),
])
def test_cli_cluster_dispatch(op, expect, capsys):
    """The 6th positional routes key-switch ops to the shard_map+Pallas
    performance path (with ICI volume reported) and others to GSPMD."""
    rc = cli.main(
        ["run", CFG, op, "8", "4", "4", "2", "--verify", "--iters", "1",
         "--platform", "cpu"]
    )
    outp = capsys.readouterr().out
    assert rc == 0, outp
    assert expect in outp
    if expect == "dispatch=shard_map+pallas":
        assert "ici_bytes_per_device" in outp


def test_cli_unknown_op():
    with pytest.raises(SystemExit):
        cli.main(["run", CFG, "bogus", "8", "4", "4"])


@pytest.mark.parametrize("op", ["hmult", "hrotate"])
def test_cli_fused_hpip_routing(op, capsys):
    """`--fused-hpip` reaches the fused HPIP kernel path (api.USE_FUSED_HPIP)
    and still decrypt-verifies; the flag is restored after the run."""
    import homulator_tpu.api as api_mod

    assert api_mod.USE_FUSED_HPIP is False  # documented v5e default
    rc = cli.main(["run", CFG, op, "8", "4", "4", "--verify", "--iters", "1",
                   "--fused-hpip"])
    outp = capsys.readouterr().out
    assert rc == 0, outp
    assert "keyswitch=fused-hpip" in outp
    assert "verify max-abs-err" in outp
    assert api_mod.USE_FUSED_HPIP is False  # restored by cli.main
