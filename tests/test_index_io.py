"""Index parsing parity vs the bundled bowtie-built e_coli index."""
import numpy as np

from bowtie_tpu.index.ebwt_io import read_embedded_occ
from tests.conftest import E_COLI_INDEX


def test_header_fields(ecoli_index):
    idx = ecoli_index
    assert idx.length == 4938920           # NC_008253 E. coli 536
    assert idx.npat == 1
    assert idx.plen[0] == 4938920
    assert idx.nfrag == 1
    assert idx.off_rate == 5
    assert idx.refnames and idx.refnames[0].startswith("gi|110640213")


def test_fchr_matches_bwt_counts(ecoli_index):
    idx = ecoli_index
    cnt = np.bincount(idx.bwt, minlength=4).astype(np.int64)
    cnt[0] -= 1  # '$' stored as 'A'
    assert np.array_equal(np.diff(idx.fchr.astype(np.int64)), cnt)
    assert idx.fchr[0] == 0 and idx.fchr[4] == idx.length


def test_occ_checkpoints_match_embedded_counters(ecoli_index, golden):
    """Our recomputed occ checkpoints must agree with the counters
    bowtie-build embedded at every side-pair boundary."""
    emb = read_embedded_occ(E_COLI_INDEX).astype(np.int64)
    idx = ecoli_index
    n_pairs = emb.shape[0]
    # vectorized: stored-char ranks at boundaries p*448+224
    boundaries = np.arange(n_pairs, dtype=np.int64) * 448 + 224
    keep = boundaries <= idx.bwt_len  # final boundary includes pad 'A's
    occ = idx.occ_checkpoints().astype(np.int64)
    B = idx.OCC_BLOCK
    for p in np.flatnonzero(keep)[:: max(1, n_pairs // 200)]:
        b = int(boundaries[p])
        # embedded counters exclude the '$' row (buildToDisk skips it:
        # "one 'a' is a skipped '$'", ebwt.h:1618), same as rank()
        mine = np.array([golden.rank(c, b) for c in range(4)])
        assert np.array_equal(mine, emb[p]), f"side pair {p}"


def test_reference_roundtrip(ecoli_ref):
    assert len(ecoli_ref) == 4938920
    assert not (ecoli_ref > 3).any()  # e_coli ref has no Ns in the index


def test_restore_tail_matches_reference(ecoli_index, golden, ecoli_ref):
    """LF-walk the last 500 chars of the text (Ebwt::restore semantics)."""
    idx = ecoli_index
    i, out = idx.length, []
    for _ in range(500):
        out.append(idx.bwt[i])
        i = golden.lf_row(i)
    assert np.array_equal(np.array(out[::-1], np.uint8), ecoli_ref[-500:])


def test_rev_index_consistent(ecoli_rev_index, ecoli_index):
    idx = ecoli_rev_index
    assert idx.length == ecoli_index.length
    assert np.array_equal(idx.fchr, ecoli_index.fchr)
