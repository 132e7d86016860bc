"""Shared utilities (ref: EbUtility.c, EbBitstreamUnit.c OutputBitstreamUnit)."""
