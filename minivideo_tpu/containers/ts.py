"""MPEG Transport Stream demuxer (skeleton).

Reference: minivideo/src/demuxer/mpeg/ts/ts.c is an empty stub (:40-71)
— the container is detected but unparseable.  Here we at least validate
sync and survey PIDs so the analyser can show something; PES reassembly
is future work.
"""

from __future__ import annotations

from collections import Counter

from ..media import MediaFile
from .. import trace

TS_PACKET = 188


def ts_parse(media: MediaFile) -> bool:
    fh = media.file_handle
    fh.seek(0)
    data = fh.read(TS_PACKET * 2048)
    pids = Counter()
    pos = 0
    while pos + TS_PACKET <= len(data):
        if data[pos] != 0x47:
            nxt = data.find(b"\x47", pos + 1)
            if nxt == -1:
                break
            pos = nxt
            continue
        pid = ((data[pos + 1] & 0x1F) << 8) | data[pos + 2]
        pids[pid] += 1
        pos += TS_PACKET
    if not pids:
        return False
    trace.info("TS", "surveyed %d packets across %d PIDs (top: %s)",
               sum(pids.values()), len(pids), pids.most_common(4))
    media.parsed = False     # no sample tables yet
    return False
