"""Inference extensions: streaming event-camera detection."""

from .streaming import StreamingDetector

__all__ = ["StreamingDetector"]
