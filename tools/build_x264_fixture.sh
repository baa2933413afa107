#!/bin/bash
# Build the independent-provenance fixture encoder (libx264 via
# libavcodec) to /tmp/x264_fixture.  See tools/x264_fixture.c.
set -e
cd "$(dirname "$0")/.."
gcc -O2 tools/x264_fixture.c -o /tmp/x264_fixture -lavcodec -lavutil
gcc -O2 tools/h264_lavc_decode.c -o /tmp/h264_lavc_decode \
    -lavcodec -lavutil
echo "built /tmp/x264_fixture + /tmp/h264_lavc_decode"
