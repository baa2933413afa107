"""CABAC entropy decoding (ITU-T H.264 clause 9.3) — slice parser.

Reference: minivideo/src/decoder/h264/h264_cabac.c (engine :2342-2563,
binarizations :619-1195, ctxIdx derivations :1338-2340) + tables (1583).
NOTE: the reference's CABAC "still has a few bugs" (README.md:22); this
implementation follows the spec, not the reference's behavior.

Implemented incrementally; `CabacSliceParser` raises UnsupportedStream
until the engine lands (build-plan step 4, SURVEY.md §7).
"""

from __future__ import annotations

from .params import UnsupportedStream


class CabacSliceParser:
    def __init__(self, rbsp, sh, sps, pps, fs):
        raise UnsupportedStream("CABAC entropy decoding not yet implemented")
