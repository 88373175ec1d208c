"""--sanity in-run oracle (cli/align.py SanityAligner): the device
engines cross-checked against the host oracle inside one run — the
analog of the reference's --sanity/--orig assertions
(ebwt_search.cpp:1893-1937)."""
import os

IDX = "/root/reference/indexes/e_coli"
RD = "/root/reference/reads/e_coli_1000.fq"


def test_sanity_run_passes(tmp_path):
    from bowtie_tpu.cli.align import main
    out = tmp_path / "out.txt"
    rc = main(["--sanity", "-v", "1", "-u", "150", "--quiet",
               IDX, RD, str(out)])
    assert rc in (0, None)
    assert out.read_bytes()


def test_sanity_catches_divergence(tmp_path, monkeypatch):
    """A corrupted device result must abort the run."""
    import pytest
    from bowtie_tpu.cli import align as cli

    class Evil:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, k):
            return getattr(self._inner, k)

        def align_batch(self, reads):
            res = self._inner.align_batch(reads)
            for r in res:
                if r.hits:
                    r.hits[0].toff += 1     # corrupt one coordinate
                    break
            return res

    orig = cli._build_se_aligner

    def wrapped(args, idx, policy):
        al, host = orig(args, idx, policy)
        if not os.environ.get("BOWTIE_TPU_HOST_ENGINE"):
            al = Evil(al)
        return al, host

    monkeypatch.setattr(cli, "_build_se_aligner", wrapped)
    out = tmp_path / "out.txt"
    with pytest.raises(AssertionError, match="sanity"):
        cli.main(["--sanity", "-v", "1", "-u", "50", "--quiet",
                  IDX, RD, str(out)])
