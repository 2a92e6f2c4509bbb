"""Data layer: datasets, query pools, fixed-shape batch loader."""

from ait_tpu.data.loader import OneShotLoader
from ait_tpu.data.prefetch import device_prefetch
from ait_tpu.data.records import DatasetView, ImageRecord, QueryExemplar

__all__ = ["OneShotLoader", "DatasetView", "ImageRecord", "QueryExemplar",
           "device_prefetch"]
