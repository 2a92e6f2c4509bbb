"""Model zoo: backbone, co-attention, RPN, AIT head, detector assembly."""

from ait_tpu.models.detector import AITDetector, DetectorOut

__all__ = ["AITDetector", "DetectorOut"]
