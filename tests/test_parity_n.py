"""Output parity for the seeded quality-aware -n modes (phases 1-4)."""
import os

import pytest

from tests.test_parity_v0 import GOLDEN, run_cli

CASES = [
    ("n2_u200", ["-n", "2", "-u", "200"]),
    ("n1_u200", ["-n", "1", "-u", "200"]),
    ("n3_u100", ["-n", "3", "-u", "100"]),
    ("n2_l20_u100", ["-n", "2", "-l", "20", "-u", "100"]),
    ("n2_e40_u100", ["-n", "2", "-e", "40", "-u", "100"]),
    ("n2_S_u200", ["-n", "2", "-S", "-u", "200"]),
]


@pytest.mark.parametrize("key,args", CASES)
def test_parity_n(key, args, tmp_path):
    golden = open(os.path.join(GOLDEN, f"{key}.out"), "rb").read()
    mine = run_cli(args, tmp_path)
    assert mine == golden
