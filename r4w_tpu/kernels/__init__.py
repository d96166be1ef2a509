from r4w_tpu.kernels.pallas_kernels import (
    dechirp_power_mxu,
    fir_decimate,
    nco_mix,
    pallas_available,
)

__all__ = [
    "dechirp_power_mxu",
    "fir_decimate",
    "nco_mix",
    "pallas_available",
]
