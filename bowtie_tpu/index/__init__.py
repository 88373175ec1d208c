from .ebwt_io import EbwtIndex, read_ebwt, read_bitpair_reference  # noqa: F401
