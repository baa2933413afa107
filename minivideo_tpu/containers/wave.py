"""WAVE demuxer.

Reference: minivideo/src/demuxer/wave/wave.c — fmt/fact/cue/data chunks
(:46-253); builds a single-sample track covering the whole data chunk
(:254-364) with the codec derived from wFormatTag (:266-333).
"""

from __future__ import annotations

import struct

from ..codecs import Codec, SampleType, StreamType, WAVE_FORMAT_TO_CODEC
from ..media import MediaFile, Track
from .. import trace
from .riff import iter_chunks


def wave_parse(media: MediaFile) -> bool:
    fh = media.file_handle
    fh.seek(0)
    hdr = fh.read(12)
    if hdr[:4] != b"RIFF" or hdr[8:12] != b"WAVE":
        return False
    riff_size = struct.unpack("<I", hdr[4:8])[0]
    end = min(8 + riff_size, media.file_size)

    fmt = {}
    data_off = data_size = 0
    for fcc, _lt, size, off in iter_chunks(fh, end):
        if fcc == b"fmt ":
            fh.seek(off)
            raw = fh.read(min(size, 18))
            if len(raw) >= 16:
                (fmt["tag"], fmt["channels"], fmt["rate"],
                 fmt["byterate"], fmt["align"], fmt["bits"]) = \
                    struct.unpack("<HHIIHH", raw[:16])
        elif fcc == b"data":
            data_off, data_size = off, size

    if not fmt or not data_size:
        trace.error("WAVE", "missing fmt or data chunk")
        return False

    codec = WAVE_FORMAT_TO_CODEC.get(fmt["tag"], Codec.UNKNOWN)
    t = Track(stream_type=StreamType.AUDIO, stream_codec=codec,
              channel_count=fmt["channels"], sampling_rate=fmt["rate"],
              bit_per_sample=fmt["bits"])
    # single sample covering the data chunk (reference wave.c:254-364)
    t.set_samples([int(SampleType.AUDIO)], [data_size], [data_off],
                  [0], [0])
    if fmt["byterate"]:
        t.stream_duration_ms = data_size * 1000.0 / fmt["byterate"]
        t.bitrate = fmt["byterate"] * 8
    t.stream_size = data_size
    t.frame_count = 1
    media.add_track(t)
    media.parsed = True
    trace.info("WAVE", "%s %d Hz %d ch, %d bytes PCM data",
               codec.name, fmt["rate"], fmt["channels"], data_size)
    return True
