#!/usr/bin/env python
"""Dump slice metadata + unescaped RBSP blob for tools/bench_parse.cc.

Writes <out>.blob (concatenated per-IDR-slice RBSP bytes) and <out>.meta
(text header: wmb hmb cabac t8 cb_off cr_off nslices; then one line per
slice: blob_offset blob_len data_bit_offset first_mb qp).

Usage: python tools/gen_slice_meta.py <stream.264> <out_prefix>
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    stream_path, out = sys.argv[1], sys.argv[2]
    data = open(stream_path, "rb").read()

    from minivideo_tpu.models.h264.decoder import H264Decoder
    from minivideo_tpu.models.h264.nalu import parse_nalu, split_annexb
    from minivideo_tpu.models.h264.slicehdr import parse_slice_header

    dec = H264Decoder()
    nalus = [parse_nalu(raw, off) for off, raw in split_annexb(data)]
    for n in nalus:
        if n.nal_unit_type in (7, 8):
            dec.feed_nalu(n)

    rows = []
    blob = bytearray()
    sps = pps = None
    for n in nalus:
        if n.nal_unit_type != 5:
            continue
        sh, sps, pps = parse_slice_header(
            n.rbsp, n.nal_unit_type, n.nal_ref_idc, dec.sps_map,
            dec.pps_map)
        rows.append((len(blob), len(n.rbsp), sh.data_bit_offset,
                     sh.first_mb_in_slice, sh.qp))
        blob += n.rbsp
    assert rows, "no IDR slices found"

    with open(out + ".blob", "wb") as f:
        f.write(bytes(blob))
    with open(out + ".meta", "w") as f:
        f.write(f"{sps.pic_width_in_mbs} {sps.pic_height_in_map_units} "
                f"{int(pps.entropy_coding_mode_flag)} "
                f"{int(pps.transform_8x8_mode_flag)} "
                f"{pps.chroma_qp_index_offset} "
                f"{pps.second_chroma_qp_index_offset} {len(rows)}\n")
        for r in rows:
            f.write(" ".join(str(x) for x in r) + "\n")
    print(f"{out}.meta: {len(rows)} slices, "
          f"{sps.pic_width_in_mbs}x{sps.pic_height_in_map_units} MBs, "
          f"cabac={int(pps.entropy_coding_mode_flag)}")


if __name__ == "__main__":
    main()
