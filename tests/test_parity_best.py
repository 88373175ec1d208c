"""Output parity for the stateful best-first engine
(--best / -M / --strata / -v 3).

Runs the HOST engine (BOWTIE_TPU_HOST_ENGINE) so the quick gate stays
compile-free; the device engine's byte parity on the same goldens is
covered by tests/test_best_device.py (slow set).
"""
import os

import pytest

from tests.test_parity_v0 import GOLDEN, run_cli


@pytest.fixture(autouse=True)
def _host_engine(monkeypatch):
    monkeypatch.setenv("BOWTIE_TPU_HOST_ENGINE", "1")

CASES = [
    ("best_v0_M1", ["-v", "0", "-M", "1"]),
    ("best_v1", ["-v", "1", "--best", "-u", "300"]),
    ("best_v2", ["-v", "2", "--best", "-u", "300"]),
    ("best_v2_M2", ["-v", "2", "-M", "2", "-u", "300"]),
    ("best_v2_strata_k3",
     ["-v", "2", "--best", "--strata", "-k", "3", "-u", "300"]),
    ("best_v2_a", ["-v", "2", "--best", "-a", "-u", "200"]),
    ("v3_u300", ["-v", "3", "-u", "300"]),
    ("best_v1_M1", ["-v", "1", "-M", "1", "-u", "300"]),
    ("v1_m5_strata_S",
     ["-v", "1", "--best", "--strata", "-m", "5", "-k", "2",
      "-u", "150", "-S"]),
]


@pytest.mark.parametrize("key,args", CASES)
def test_parity_best(key, args, tmp_path):
    golden = open(os.path.join(GOLDEN, f"{key}.out"), "rb").read()
    mine = run_cli(args, tmp_path)
    assert mine == golden


SEEDED_CASES = [
    ("best_n2", ["-n", "2", "--best", "-u", "300"]),
    ("best_n2_M1", ["-n", "2", "-M", "1", "-u", "300"]),
    ("best_n2_strata",
     ["-n", "2", "--best", "--strata", "-k", "2", "-u", "300"]),
    ("best_n3", ["-n", "3", "--best", "-u", "200"]),
    ("best_n2_l20", ["-n", "2", "--best", "-l", "20", "-u", "200"]),
    ("best_n0", ["-n", "0", "--best", "-u", "200"]),
]


@pytest.mark.parametrize("key,args", SEEDED_CASES)
def test_parity_seeded_best(key, args, tmp_path):
    golden = open(os.path.join(GOLDEN, f"{key}.out"), "rb").read()
    mine = run_cli(args, tmp_path)
    assert mine == golden
