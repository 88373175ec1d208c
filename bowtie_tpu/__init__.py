"""bowtie_tpu: a TPU-native short-read aligner with the capabilities of Bowtie 1.

A brand-new JAX/XLA/Pallas implementation of Bowtie's alignment method:
an Ebwt FM-index held resident in HBM, LF-mapping/backward search and
quality-aware mismatch backtracking run as batched kernels over thousands
of reads in lockstep, with SA-offset resolution on device and SAM/verbose
emission on host.

Reference semantics: BenLangmead/bowtie v1.3.1 (cited as file:line in
docstrings throughout). This is a from-scratch TPU-first design, not a port.
"""

__version__ = "0.1.0"
