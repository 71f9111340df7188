from .ac import (
    binary_encode,
    binary_decode,
    binary_encode_batch,
    binary_decode_batch,
    binary_estimate_bits,
    shared_cdf_encode,
    shared_cdf_decode,
)
from .container import pack_bitstream, unpack_bitstream
