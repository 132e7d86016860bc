"""Independent bitstream conformance checking (no shared code with
svt_av1_tpu.entropy)."""

from svt_av1_tpu.conformance.checker import (  # noqa: F401
    ConformanceError, check_stream, check_temporal_unit)
