"""FEC stack (SURVEY.md §7 step 5; family root fec/mod.rs):
convolutional/Viterbi, CRC, block codes (repetition/Golay),
Reed-Solomon, BCH, LDPC, turbo, polar, interleavers, puncturing."""

from r4w_tpu.fec import dvb_s2x, fountain
from r4w_tpu.fec.convolutional import (
    conv_encode,
    depuncture,
    puncture,
    viterbi_decode,
)
from r4w_tpu.fec.crc import CRC_PARAMS, crc_check, crc_compute, fletcher16
from r4w_tpu.fec.block import (
    golay_decode,
    golay_encode,
    matrix_encode,
    repetition_decode,
    repetition_encode,
    syndrome,
)
from r4w_tpu.fec.galois import BCH, GF, ReedSolomon
from r4w_tpu.fec.ldpc import (
    ldpc_decode,
    ldpc_encode,
    ldpc_extract_data,
    make_regular_ldpc,
)
from r4w_tpu.fec.turbo import turbo_decode, turbo_encode, default_interleaver
from r4w_tpu.fec.polar import frozen_mask, polar_decode, polar_encode
from r4w_tpu.fec.interleave import (
    block_deinterleave,
    block_interleave,
    patterned_deinterleave,
    patterned_interleave,
)
from r4w_tpu.ops.coding import hamming_decode, hamming_encode

__all__ = [
    "fountain",
    "conv_encode", "viterbi_decode", "puncture", "depuncture",
    "crc_compute", "crc_check", "fletcher16", "CRC_PARAMS",
    "repetition_encode", "repetition_decode", "golay_encode",
    "golay_decode", "matrix_encode", "syndrome",
    "GF", "ReedSolomon", "BCH",
    "ldpc_encode", "ldpc_decode", "ldpc_extract_data", "make_regular_ldpc",
    "turbo_encode", "turbo_decode", "default_interleaver",
    "polar_encode", "polar_decode", "frozen_mask",
    "block_interleave", "block_deinterleave",
    "patterned_interleave", "patterned_deinterleave",
    "hamming_encode", "hamming_decode",
]
