#!/bin/bash
# Regenerate golden parity fixtures from the reference bowtie binary.
# Compiles the reference (read-only, out-of-tree) into .oracle/ first.
set -e
cd "$(dirname "$0")/.."
R=${REFERENCE:-/root/reference}
mkdir -p .oracle
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
IDX=$R/indexes/e_coli
RD=$R/reads/e_coli_1000.fq
declare -A CASES=(
  [v0]="-v 0" [v0_S]="-v 0 -S" [v1_u200]="-v 1 -u 200" [v2_u200]="-v 2 -u 200" [v2_a_u100]="-v 2 -a -u 100" [v1_k2_u200]="-v 1 -k 2 -u 200" [v2_S_u200]="-v 2 -S -u 200" [v0_a]="-v 0 -a" [v0_k3]="-v 0 -k 3"
  [v0_m1]="-v 0 -m 1" [v0_am2]="-v 0 -a -m 2" [v0_nofw]="-v 0 --nofw"
  [v0_norc]="-v 0 --norc" [v0_SM1]="-v 0 -S -M 1" [v0_M1]="-v 0 -M 1"
)
for key in "${!CASES[@]}"; do
  ./.oracle/bowtie-align-s ${CASES[$key]} --quiet $IDX $RD 2>/dev/null \
    | grep -v "^@PG" > tests/golden/${key}.out
done
echo "golden files written to tests/golden/"
