"""Frame encode orchestration.

The reference's 15-stage threaded pipeline (SURVEY.md §2.2) maps here to:
  device: batched wavefront mode-decision/transform/recon sweeps
          (intra_encoder.py — replaces EncDecKernel's wavefront segments)
  host:   entropy tile writer (tile.py — replaces EntropyCodingKernel),
          OBU packetization (encoder.py — replaces PacketizationKernel).
"""
