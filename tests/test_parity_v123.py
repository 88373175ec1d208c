"""Output parity for -v 1/2 whole-read mismatch modes (oracle engine)."""
import os

import pytest

from tests.test_parity_v0 import GOLDEN, IDX, READS, run_cli

CASES = [
    ("v1_u200", ["-v", "1", "-u", "200"]),
    ("v2_u200", ["-v", "2", "-u", "200"]),
    ("v2_a_u100", ["-v", "2", "-a", "-u", "100"]),
    ("v1_k2_u200", ["-v", "1", "-k", "2", "-u", "200"]),
    ("v2_S_u200", ["-v", "2", "-S", "-u", "200"]),
]


@pytest.mark.parametrize("key,args", CASES)
def test_parity_v123(key, args, tmp_path):
    golden = open(os.path.join(GOLDEN, f"{key}.out"), "rb").read()
    mine = run_cli(args, tmp_path)
    assert mine == golden
