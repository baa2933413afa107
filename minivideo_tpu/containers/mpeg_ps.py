"""MPEG Program Stream demuxer.

Reference: minivideo/src/demuxer/mpeg/ps/ps.c — PES-packet loop keyed on
stream_id (:308-485): pack header (:50), system header (:147), PSM
(:196), audio 0xC0-0xDF / private-1, video 0xE0-0xEF; per packet the
payload (offset/size/PTS/DTS) is appended to the track's sample table.
"""

from __future__ import annotations

import numpy as np

from ..codecs import Codec, SampleType, StreamType
from ..media import MediaFile, Track
from .. import trace
from . import pes as P


def ps_parse(media: MediaFile) -> bool:
    fh = media.file_handle
    fh.seek(0)
    data = fh.read()
    n = len(data)
    audio = {}   # stream_id -> list of (off, size, pts, dts)
    video = {}
    stats = {"pack": 0, "system": 0, "psm": 0, "audio": 0, "video": 0,
             "private": 0}

    pos = data.find(b"\x00\x00\x01")
    while pos != -1 and pos + 4 <= n:
        sid = data[pos + 3]
        if sid == P.SID_PACK_HEADER:
            stats["pack"] += 1
            # MPEG-2 pack header: 10 bytes + stuffing; MPEG-1: 8 bytes
            if pos + 14 <= n and (data[pos + 4] >> 6) == 0b01:
                stuffing = data[pos + 13] & 7
                pos += 14 + stuffing
            else:
                pos += 12
        elif sid == P.SID_SYSTEM_HEADER:
            stats["system"] += 1
            ln = (data[pos + 4] << 8) | data[pos + 5]
            pos += 6 + ln
        elif sid == P.SID_PSM:
            stats["psm"] += 1
            ln = (data[pos + 4] << 8) | data[pos + 5]
            pos += 6 + ln
        elif sid == P.SID_PROGRAM_END:
            break
        elif (P.SID_AUDIO_FIRST <= sid <= P.SID_AUDIO_LAST
              or sid == P.SID_PRIVATE_1):
            h = P.parse_pes_header(data, pos)
            stats["audio" if sid != P.SID_PRIVATE_1 else "private"] += 1
            off = pos + h.header_size
            size = max(0, h.payload_size)
            audio.setdefault(sid, []).append((off, size, h.pts, h.dts))
            pos += 6 + h.packet_length
        elif P.SID_VIDEO_FIRST <= sid <= P.SID_VIDEO_LAST:
            h = P.parse_pes_header(data, pos)
            stats["video"] += 1
            off = pos + h.header_size
            size = max(0, h.payload_size)
            video.setdefault(sid, []).append((off, size, h.pts, h.dts))
            pos += 6 + h.packet_length
        elif sid == P.SID_PADDING:
            ln = (data[pos + 4] << 8) | data[pos + 5]
            pos += 6 + ln
        else:
            pos += 4
        nxt = data.find(b"\x00\x00\x01", pos)
        pos = nxt

    ok = False
    for sid, packets in video.items():
        codec = _sniff_video(data, packets)
        t = _make_track(packets, StreamType.VIDEO, codec)
        if codec == Codec.H264:
            # mark IDR-bearing packets as sync samples
            for j, (off, size, _, _) in enumerate(packets):
                chunk = data[off:off + min(size, 4096)]
                if (b"\x00\x00\x01\x65" in chunk
                        or b"\x00\x00\x01\x25" in chunk):
                    t.sample_type[j] = int(SampleType.VIDEO_SYNC)
            t.compute_stats()
        media.add_track(t)
        ok = True
        trace.info("PS", "video stream 0x%02X: %d PES packets", sid,
                   len(packets))
    for sid, packets in audio.items():
        codec = (Codec.AC3 if sid == P.SID_PRIVATE_1
                 else _sniff_audio(data, packets))
        t = _make_track(packets, StreamType.AUDIO, codec)
        media.add_track(t)
        ok = True
        trace.info("PS", "audio stream 0x%02X: %d PES packets", sid,
                   len(packets))
    trace.t1("PS", "stats: %s", stats)
    media.parsed = ok
    return ok


def _make_track(packets, stype, codec) -> Track:
    t = Track(stream_type=stype, stream_codec=codec)
    offs = [p[0] for p in packets]
    sizes = [p[1] for p in packets]
    # PTS/DTS: 90 kHz -> ns
    pts = np.array([p[2] * 100000 // 9 if p[2] >= 0 else -1
                    for p in packets], dtype=np.int64)
    dts = np.array([p[3] * 100000 // 9 if p[3] >= 0 else -1
                    for p in packets], dtype=np.int64)
    kinds = ([int(SampleType.VIDEO)] * len(offs)
             if stype == StreamType.VIDEO
             else [int(SampleType.AUDIO)] * len(offs))
    t.set_samples(kinds, sizes, offs, pts, dts)
    t.compute_stats()
    return t


def _sniff_video(data, packets) -> Codec:
    """Peek at the first payload bytes (reference parse_pes_v,
    pes.c:985-1120 reads MPEG-1/2 sequence headers; H.264 detected by NALU
    start codes)."""
    if not packets:
        return Codec.UNKNOWN
    off, size, _, _ = packets[0]
    head = data[off:off + min(size, 16)]
    if head[:4] == b"\x00\x00\x01\xb3":
        return Codec.MPEG2
    if b"\x00\x00\x01" in head:
        nalpos = head.find(b"\x00\x00\x01") + 3
        if nalpos < len(head) and (head[nalpos] & 0x1F) in (5, 7, 8):
            return Codec.H264
    return Codec.MPEG2


def _sniff_audio(data, packets) -> Codec:
    """Reference parse_pes_a reads AC-3 or MPEG audio headers
    (pes.c:645-...)."""
    if not packets:
        return Codec.UNKNOWN
    off, size, _, _ = packets[0]
    head = data[off:off + min(size, 4)]
    if head[:2] == b"\x0b\x77":
        return Codec.AC3
    if len(head) >= 2 and head[0] == 0xFF and (head[1] & 0xE0) == 0xE0:
        layer = (head[1] >> 1) & 3
        return {1: Codec.MPEG_L3, 2: Codec.MPEG_L2,
                3: Codec.MPEG_L1}.get(layer, Codec.MPEG_L2)
    return Codec.MPEG_L2
