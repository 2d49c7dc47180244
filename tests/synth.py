"""Shim: synthetic media generation lives in the package (bench uses it)."""
from describealign_tpu.utils.synthmedia import (SR, build_pair,
                                                mapping_from_segments,
                                                speech_like)
