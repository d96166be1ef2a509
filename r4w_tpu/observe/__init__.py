"""Observability: logs, metrics, capture (observe/mod.rs family root)."""

from r4w_tpu.observe.capture import CaptureConfig, CaptureManager, CaptureState
from r4w_tpu.observe.logging import get_logger, init_logging
from r4w_tpu.observe.metrics import (
    REGISTRY,
    Counter,
    Gauge,
    Histogram,
    MetricsRegistry,
    Timer,
    serve_metrics,
)

__all__ = [
    "CaptureConfig", "CaptureManager", "CaptureState",
    "get_logger", "init_logging",
    "REGISTRY", "Counter", "Gauge", "Histogram", "MetricsRegistry",
    "Timer", "serve_metrics",
]
