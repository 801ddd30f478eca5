"""Pure-numpy codec kernels (no Spark imports here — unit-testable fast).

Encode operators E1-E9 and decode operators D3-D15 from SURVEY.md §2.3/§2.4.
"""

from datafusion_orc_spark.codecs.bitpack import (
    WIDTH_TABLE,
    closest_fixed_width,
    width_code,
    decode_width,
    bit_pack,
    bit_unpack,
)
from datafusion_orc_spark.codecs.varint import (
    zigzag_encode,
    zigzag_decode,
    varint_encode,
    varint_decode,
)
from datafusion_orc_spark.codecs.byterle import (
    byte_rle_encode,
    byte_rle_decode,
    bool_rle_encode,
    bool_rle_decode,
)
from datafusion_orc_spark.codecs.rlev2 import rle_v2_encode, rle_v2_decode

__all__ = [
    "WIDTH_TABLE",
    "closest_fixed_width",
    "width_code",
    "decode_width",
    "bit_pack",
    "bit_unpack",
    "zigzag_encode",
    "zigzag_decode",
    "varint_encode",
    "varint_decode",
    "byte_rle_encode",
    "byte_rle_decode",
    "bool_rle_encode",
    "bool_rle_decode",
    "rle_v2_encode",
    "rle_v2_decode",
]
