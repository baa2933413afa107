"""PES packet parsing, shared by MPEG-PS (and later TS).

Reference: minivideo/src/demuxer/mpeg/pes/pes.c — header + extension
parsing incl. 33-bit PTS/DTS reconstruction (:107-456).
"""

from __future__ import annotations

from dataclasses import dataclass

from .. import trace

# stream_id ranges (spec ISO 13818-1 table 2-18)
SID_PROGRAM_END = 0xB9
SID_PACK_HEADER = 0xBA
SID_SYSTEM_HEADER = 0xBB
SID_PSM = 0xBC
SID_PRIVATE_1 = 0xBD
SID_PADDING = 0xBE
SID_PRIVATE_2 = 0xBF
SID_AUDIO_FIRST = 0xC0
SID_AUDIO_LAST = 0xDF
SID_VIDEO_FIRST = 0xE0
SID_VIDEO_LAST = 0xEF
SID_PSD = 0xFF


@dataclass
class PesHeader:
    stream_id: int
    packet_length: int
    pts: int = -1           # 90 kHz ticks
    dts: int = -1
    header_size: int = 6    # bytes incl. start code
    payload_size: int = 0


def _timestamp_33(b: bytes) -> int:
    """Reassemble a 33-bit PTS/DTS from 5 marker-laced bytes
    (reference pes.c PTS/DTS parse)."""
    return (((b[0] >> 1) & 0x07) << 30) | (b[1] << 22) | \
        (((b[2] >> 1) & 0x7F) << 15) | (b[3] << 7) | ((b[4] >> 1) & 0x7F)


def parse_pes_header(data: bytes, pos: int) -> PesHeader:
    """Parse a PES packet header at `pos` (data[pos:pos+3] == 00 00 01).

    Returns a PesHeader; header_size covers everything before the ES
    payload."""
    sid = data[pos + 3]
    plen = (data[pos + 4] << 8) | data[pos + 5]
    h = PesHeader(stream_id=sid, packet_length=plen)
    p = pos + 6
    if sid in (SID_PADDING, SID_PRIVATE_2) or sid < 0xBD:
        h.header_size = p - pos
        h.payload_size = plen
        return h
    # MPEG-2 PES header
    if p + 3 > len(data):
        h.header_size = p - pos
        return h
    flags1 = data[p]
    if (flags1 >> 6) != 0b10:
        # MPEG-1 style header: skip stuffing then optional STD/PTS
        q = p
        while q < len(data) and data[q] == 0xFF:
            q += 1
        if q < len(data) and (data[q] >> 6) == 0b01:
            q += 2
        if q < len(data):
            tag = data[q] >> 4
            if tag == 0b0010:
                h.pts = _timestamp_33(data[q:q + 5])
                q += 5
            elif tag == 0b0011:
                h.pts = _timestamp_33(data[q:q + 5])
                h.dts = _timestamp_33(data[q + 5:q + 10])
                q += 10
            else:
                q += 1
        h.header_size = q - pos
        h.payload_size = plen - (q - (pos + 6))
        return h
    flags2 = data[p + 1]
    hdr_len = data[p + 2]
    q = p + 3
    pts_dts = (flags2 >> 6) & 3
    if pts_dts >= 2 and q + 5 <= len(data):
        h.pts = _timestamp_33(data[q:q + 5])
        if pts_dts == 3 and q + 10 <= len(data):
            h.dts = _timestamp_33(data[q + 5:q + 10])
        else:
            h.dts = h.pts
    h.header_size = (p + 3 + hdr_len) - pos
    h.payload_size = plen - 3 - hdr_len
    return h
