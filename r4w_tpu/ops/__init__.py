from r4w_tpu.ops import (
    coding,
    filters,
    impairments,
    measure,
    pulse,
    resample,
    spreading,
    sync,
)

__all__ = [
    "coding",
    "filters",
    "impairments",
    "measure",
    "pulse",
    "resample",
    "spreading",
    "sync",
]
