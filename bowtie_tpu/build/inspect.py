"""bowtie-inspect equivalent (bowtie_inspect.cpp:1-533): decode an
index back to FASTA, print names or a summary."""
from __future__ import annotations

import numpy as np

from ..index.ebwt_io import (EbwtIndex, read_bitpair_reference, read_ebwt,
                             unpack_reference)
from ..utils.alphabet import codes_to_seq


def restore_via_lf(idx: EbwtIndex) -> np.ndarray:
    """Rebuild the joined text purely from the BWT by LF-walking
    (Ebwt::restore, ebwt.h:2763-2781; the `-e` path).  Vectorized in
    blocks is impossible (sequential chain), so this is a tight loop
    over precomputed arrays."""
    from ..align.golden import GoldenFM
    g = GoldenFM(idx)
    n = idx.length
    out = np.zeros(n, dtype=np.uint8)
    # precompute LF for every row once (vectorized), then chase the
    # chain; LF[i] = fchr[bwt[i]] + rank(bwt[i], i)
    bwt = idx.bwt.astype(np.int64)
    occ = idx.occ_checkpoints().astype(np.int64)
    B = idx.OCC_BLOCK
    blocks = np.arange(len(bwt)) // B
    base = occ[blocks, bwt]
    # within-block running count of same char
    within = np.zeros(len(bwt), dtype=np.int64)
    for c in range(4):
        mask = bwt == c
        m2 = mask.reshape(-1, B) if len(bwt) % B == 0 else None
        cs = np.cumsum(mask)
        block_start_cs = np.repeat(
            np.concatenate([[0], cs[B - 1::B]])[:len(occ) - 1], B)[:len(bwt)]
        within[mask] = (cs - block_start_cs - 1)[mask]
    lf = idx.fchr[np.minimum(bwt, 3)].astype(np.int64) + base + within
    # '$' correction: rows after zoff counting an 'A' too many
    corr = (bwt == 0) & (np.arange(len(bwt)) > idx.zoff)
    lf[corr] -= 1
    i = n
    for pos in range(n - 1, -1, -1):
        out[pos] = bwt[i]
        i = lf[i]
    assert i == idx.zoff
    return out


def inspect(basename: str, names_only: bool = False,
            summary: bool = False, across: int = 60,
            use_ebwt: bool = False, extra: bool = False, out=None):
    import sys
    out = out or sys.stdout
    idx = read_ebwt(basename, load_offs=False)
    if names_only:
        for n in idx.refnames:
            out.write(n + "\n")
        return
    if summary:
        # print_index_summary (bowtie_inspect.cpp:352-404); the Flags
        # lines appear only with --extra
        if extra:
            rev = read_ebwt(basename + ".rev", load_offs=False)
            out.write(f"Flags\t{idx.flags}\n")
            out.write(f"Reverse flags\t{rev.flags}\n")
            er = rev.entire_reverse
            out.write(f"Concat then reverse\t{1 if er else 0}\n")
            out.write(f"Reverse then concat\t{0 if er else 1}\n")
            recs, _ = read_bitpair_reference(basename)
            # numRefs counts first-records; a ref is non-gap iff its
            # first record has len > 0 (reference.h:148-176)
            num_refs = sum(1 for r in recs if r[2])
            non_gap = sum(1 for r in recs if r[2] and r[1] > 0)
            out.write(f"nPat\t{idx.npat}\n")
            out.write(f"refnames.size()\t{len(idx.refnames)}\n")
            out.write(f"refs.numRefs()\t{num_refs}\n")
            out.write(f"refs.numNonGapRefs()\t{non_gap}\n")
        out.write(f"SA-Sample\t1 in {1 << idx.off_rate}\n")
        out.write(f"FTab-Chars\t{idx.ftab_chars}\n")
        for i, n in enumerate(idx.refnames):
            out.write(f"Sequence-{i + 1}\t{n}\t{idx.plen[i]}\n")
        if extra:
            out.write("RefRecords:\n")
            for off, ln, first in recs:
                out.write(f"{1 if first else 0}\t({off}, {ln})\n")
        return
    if use_ebwt:
        joined = restore_via_lf(idx)
        # split joined text back into per-reference sequences with N
        # gaps restored, using rstarts/plen
        seqs = _joined_to_refs(idx, joined)
    else:
        recs, packed = read_bitpair_reference(basename)
        seqs = unpack_reference(recs, packed, plen=idx.plen)
    for i, codes in enumerate(seqs):
        name = idx.refnames[i] if i < len(idx.refnames) else str(i)
        out.write(f">{name}\n")
        s = codes_to_seq(codes)
        for j in range(0, len(s), across):
            out.write(s[j:j + across] + "\n")


def _joined_to_refs(idx: EbwtIndex, joined: np.ndarray):
    seqs = []
    for ridx in range(idx.npat):
        seq = np.full(int(idx.plen[ridx]), 4, dtype=np.uint8)
        seqs.append(seq)
    starts = idx.rstarts
    for f in range(idx.nfrag):
        joff, ridx, roff = (int(starts[f, 0]), int(starts[f, 1]),
                            int(starts[f, 2]))
        end = int(starts[f + 1, 0]) if f + 1 < idx.nfrag else idx.length
        seqs[ridx][roff:roff + (end - joff)] = joined[joff:end]
    return seqs
