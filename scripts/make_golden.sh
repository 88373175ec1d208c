#!/bin/bash
# Regenerate ALL golden parity fixtures from the reference bowtie
# binaries.  Compiles the reference (read-only, out-of-tree) into
# .oracle/ first.  Every committed tests/golden/*.out is produced here;
# the small-genome indexes under tests/golden/small_index{,_l} are
# rebuilt too.
set -e
cd "$(dirname "$0")/.."
R=${REFERENCE:-/root/reference}
mkdir -p .oracle
COMMON="-O3 -m64 -fno-strict-aliasing -DBOWTIE_VERSION=\"1.3.1\""
if [ ! -x .oracle/bowtie-align-s ]; then
  g++ -O3 -m64 -fno-strict-aliasing -DBOWTIE_VERSION='"1.3.1"' \
    -DBUILD_HOST='"x"' -DBUILD_TIME='"x"' -DCOMPILER_VERSION='"g++"' \
    -DCOMPILER_OPTIONS='"x"' -D_LARGEFILE_SOURCE -D_FILE_OFFSET_BITS=64 \
    -D_GNU_SOURCE -DBOWTIE_PTHREADS -DPREFETCH_LOCALITY=2 -DNDEBUG -Wall \
    -I$R -o .oracle/bowtie-align-s \
    $R/ebwt_search.cpp $R/ccnt_lut.cpp $R/ref_read.cpp $R/alphabet.cpp \
    $R/shmem.cpp $R/edit.cpp $R/ebwt.cpp $R/bt2_locks.cpp $R/tinythread.cpp \
    $R/qual.cpp $R/pat.cpp $R/ebwt_search_util.cpp $R/ref_aligner.cpp \
    $R/log.cpp $R/hit_set.cpp $R/sam.cpp $R/hit.cpp $R/bowtie_main.cpp \
    -lpthread -lz
fi
if [ ! -x .oracle/bowtie-build-s ]; then
  g++ -O3 -m64 -fno-strict-aliasing -DBOWTIE_VERSION='"1.3.1"' \
    -DBUILD_HOST='"x"' -DBUILD_TIME='"x"' -DCOMPILER_VERSION='"g++"' \
    -DCOMPILER_OPTIONS='"x"' -D_LARGEFILE_SOURCE -D_FILE_OFFSET_BITS=64 \
    -D_GNU_SOURCE -DBOWTIE_PTHREADS -DNDEBUG -Wall \
    -I$R -o .oracle/bowtie-build-s \
    $R/ebwt_build.cpp $R/ccnt_lut.cpp $R/ref_read.cpp $R/alphabet.cpp \
    $R/shmem.cpp $R/edit.cpp $R/ebwt.cpp $R/bt2_locks.cpp $R/tinythread.cpp \
    $R/bowtie_build_main.cpp -lpthread -lz
fi
if [ ! -x .oracle/bowtie-build-l ]; then
  g++ -O3 -m64 -fno-strict-aliasing -DBOWTIE_VERSION='"1.3.1"' \
    -DBOWTIE_64BIT_INDEX \
    -DBUILD_HOST='"x"' -DBUILD_TIME='"x"' -DCOMPILER_VERSION='"g++"' \
    -DCOMPILER_OPTIONS='"x"' -D_LARGEFILE_SOURCE -D_FILE_OFFSET_BITS=64 \
    -D_GNU_SOURCE -DBOWTIE_PTHREADS -DNDEBUG -Wall \
    -I$R -o .oracle/bowtie-build-l \
    $R/ebwt_build.cpp $R/ccnt_lut.cpp $R/ref_read.cpp $R/alphabet.cpp \
    $R/shmem.cpp $R/edit.cpp $R/ebwt.cpp $R/bt2_locks.cpp $R/tinythread.cpp \
    $R/bowtie_build_main.cpp -lpthread -lz
fi
if [ ! -x .oracle/bowtie-inspect-s ]; then
  g++ -O3 -m64 -fno-strict-aliasing -DBOWTIE_VERSION='"1.3.1"' \
    -DBUILD_HOST='"x"' -DBUILD_TIME='"x"' -DCOMPILER_VERSION='"g++"' \
    -DCOMPILER_OPTIONS='"x"' -D_LARGEFILE_SOURCE -D_FILE_OFFSET_BITS=64 \
    -D_GNU_SOURCE -DBOWTIE_PTHREADS -DNDEBUG -Wall \
    -I$R -o .oracle/bowtie-inspect-s \
    $R/bowtie_inspect.cpp $R/ccnt_lut.cpp $R/ref_read.cpp $R/alphabet.cpp \
    $R/shmem.cpp $R/edit.cpp $R/ebwt.cpp $R/bt2_locks.cpp $R/tinythread.cpp \
    -lpthread -lz
fi

# BINARIES_ONLY=1: stop after compiling the oracles (CI uses the live
# binaries for byte-compares and must not regenerate committed goldens)
[ -n "$BINARIES_ONLY" ] && exit 0

IDX=$R/indexes/e_coli
RD=$R/reads/e_coli_1000.fq
R1=$R/reads/e_coli_1000_1.fq
R2=$R/reads/e_coli_1000_2.fq
B=./.oracle/bowtie-align-s
G=tests/golden

run() { # run <outfile> <args...>
  local out=$1; shift
  $B "$@" --quiet $IDX $RD 2>/dev/null | { grep -v "^@PG" || true; } > $G/$out.out
}
runpe() { # runpe <outfile> <args...>
  local out=$1; shift
  $B "$@" --quiet -1 $R1 -2 $R2 $IDX 2>/dev/null \
    | { grep -v "^@PG" || true; } > $G/$out.out
}

# ---- single-end -v cases (test_parity_v0.py / test_parity_v123.py) ----
run v0        -v 0
run v0_S      -v 0 -S
run v0_a      -v 0 -a
run v0_k3     -v 0 -k 3
run v0_m1     -v 0 -m 1
run v0_am2    -v 0 -a -m 2
run v0_nofw   -v 0 --nofw
run v0_norc   -v 0 --norc
run v0_SM1    -v 0 -S -M 1
run v0_M1     -v 0 -M 1
run v1_u200   -v 1 -u 200
run v2_u200   -v 2 -u 200
run v2_a_u100 -v 2 -a -u 100
run v1_k2_u200 -v 1 -k 2 -u 200
run v2_S_u200 -v 2 -S -u 200
run v0_m2_S   -v 0 -m 2 -S
run v1_m5_strata_S -v 1 --best --strata -m 5 -k 2 -u 150 -S

# ---- seeded -n cases (test_parity_n.py) ----
run n2_u200     -n 2 -u 200
run n1_u200     -n 1 -u 200
run n3_u100     -n 3 -u 100
run n2_l20_u100 -n 2 -l 20 -u 100
run n2_e40_u100 -n 2 -e 40 -u 100
run n2_S_u200   -n 2 -S -u 200

# ---- best-first cases (test_parity_best.py) ----
run best_v0_M1        -v 0 -M 1
run best_v1           -v 1 --best -u 300
run best_v2           -v 2 --best -u 300
run best_v2_M2        -v 2 -M 2 -u 300
run best_v2_strata_k3 -v 2 --best --strata -k 3 -u 300
run best_v2_a         -v 2 --best -a -u 200
run v3_u300           -v 3 -u 300
run best_v1_M1        -v 1 -M 1 -u 300
run best_n2           -n 2 --best -u 300
run best_n2_M1        -n 2 -M 1 -u 300
run best_n2_strata    -n 2 --best --strata -k 2 -u 300
run best_n3           -n 3 --best -u 200
run best_n2_l20       -n 2 --best -l 20 -u 200
run best_n0           -n 0 --best -u 200

# ---- paired-end cases (test_paired.py) ----
runpe pe_n2_u200    -n 2 -u 200
runpe pe_v1_u200    -v 1 -u 200
runpe pe_n2_S_u200  -n 2 -S -u 200
runpe pe_n2_IX_u200 -n 2 -I 50 -X 170 -u 200
runpe pe_n2_a_u200  -n 2 -a -u 200
runpe pe_ff_n2_u200 --ff -n 2 -u 200
runpe pe_v0_u200    -v 0 -u 200
runpe pe_best_n2_u200   -n 2 --best -u 200
runpe pe_pev2_n2_u200   --pev2 -n 2 -u 200
runpe pe_rs_pev2_u200   --reportse --pev2 -n 2 -u 200
runpe pe_rs_pev2_S_u200 --reportse --pev2 -n 2 -S -u 200
runpe pe_n2_M1_u200     -n 2 --best -M 1 -u 200
runpe pe_best_v1_u200   -v 1 --best -u 200

# ---- FF-orientation fixture with REAL alignments ----
# e_coli_1000_{1,2}.fq are FR-oriented, so the --ff case above aligns
# nothing.  Synthesize mates in FF orientation from the genome
# (deterministic) so the --ff policy path is actually exercised.
python - <<'PYEOF'
import numpy as np
from bowtie_tpu.index.ebwt_io import (read_bitpair_reference,
                                      unpack_reference)
from bowtie_tpu.utils.alphabet import codes_to_seq
recs, packed = read_bitpair_reference("/root/reference/indexes/e_coli")
ref = unpack_reference(recs, packed)[0]
rng = np.random.default_rng(20260817)
L = 35
with open("tests/golden/pe_ff_1.fq", "w") as f1, \
     open("tests/golden/pe_ff_2.fq", "w") as f2:
    for i in range(200):
        while True:
            p1 = int(rng.integers(0, len(ref) - 400))
            ins = int(rng.integers(100, 250))
            m1 = ref[p1:p1 + L]
            m2 = ref[p1 + ins - L:p1 + ins]
            if (m1 <= 3).all() and (m2 <= 3).all():
                break
        # a couple of mismatches on some pairs
        m1, m2 = m1.copy(), m2.copy()
        if i % 3 == 0:
            q = int(rng.integers(0, L))
            m1[q] = (m1[q] + 1) % 4
        s1 = codes_to_seq(m1)
        s2 = codes_to_seq(m2)
        f1.write(f"@ffr{i}/1\n{s1}\n+\n{'I' * L}\n")
        f2.write(f"@ffr{i}/2\n{s2}\n+\n{'I' * L}\n")
PYEOF
$B --ff -n 2 -I 60 -X 300 --quiet \
   -1 tests/golden/pe_ff_1.fq -2 tests/golden/pe_ff_2.fq $IDX \
   2>/dev/null | { grep -v "^@PG" || true; } > $G/pe_ff_real.out

# ---- small-genome build goldens (test_build.py) ----
mkdir -p $G/small_index $G/small_index_l
./.oracle/bowtie-build-s -o 5 -t 7 $G/small_genome.fa \
  $G/small_index/small_oracle >/dev/null
./.oracle/bowtie-build-l -o 5 -t 7 $G/small_genome.fa \
  $G/small_index_l/small_oracle >/dev/null

echo "golden files written to tests/golden/"
