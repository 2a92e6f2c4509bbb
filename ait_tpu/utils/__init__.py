"""Shared utilities: logging, metrics, profiling."""

from ait_tpu.utils.logging import (AverageMeter, MetricWriter,
                                   ThroughputMeter, color, printer)
from ait_tpu.utils.profiling import annotate, device_trace, timed

__all__ = ["AverageMeter", "MetricWriter", "ThroughputMeter", "color",
           "printer", "annotate", "device_trace", "timed"]
