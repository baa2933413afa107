#!/bin/bash
# Build the reference MiniVideo decoder as a golden-test oracle.
# Copies /root/reference to /tmp (the reference tree is read-only and its
# build writes generated headers into the source dir), patches two build
# issues (missing portable_endian.h, missing export header), enables the
# I_PCM decode path, and builds libminivideo + mini_thumbnailer.
set -e
SRC=/root/reference/minivideo
DST=/tmp/refsrc
if [ ! -f /tmp/mini_thumbnailer ] || [ "$1" == "-f" ]; then
  rm -rf "$DST"
  cp -r "$SRC" "$DST"
  chmod -R u+w "$DST"
  cat > "$DST/src/portable_endian.h" <<'EOH'
#ifndef PORTABLE_ENDIAN_H__
#define PORTABLE_ENDIAN_H__
#include <endian.h>
#endif
EOH
  mkdir -p "$DST/build"
  cat > "$DST/build/minivideo_Export.h" <<'EOH'
#ifndef MINIVIDEO_EXPORT_H
#define MINIVIDEO_EXPORT_H
#define minivideo_EXPORT
#endif
EOH
  # Fix an out-of-bounds read in the reference's CABAC ctxIdxOffset
  # table search (h264_cabac.c getCtxIdx: `while (i < 22) { i++; ... }`
  # reads ctxIdxOffset_table[22] of a 22-entry array).  GCC 12 -O2
  # exploits the UB when vectorizing the loop and the compiled search
  # spuriously "matches" offsets like 85 (coded_block_flag), killing ALL
  # CABAC decoding.  Patching the bound restores the intended behavior
  # so CABAC goldens are possible.
  python3 - "$DST/src/decoder/h264/h264_cabac.c" <<'EOP'
import sys
p = sys.argv[1]
s = open(p).read()
old = ("    while (i < 22)\n    {\n        i++;\n\n"
       "        if (ctxIdxOffset == ctxIdxOffset_table[i])")
assert old in s, "CABAC table-search loop not found"
open(p, 'w').write(s.replace(old, old.replace("i < 22", "i < 21"), 1))
EOP
  # enable I_PCM decoding (compiled out by default)
  python3 - "$DST/src/minivideo_settings.h.in" <<'EOP'
import sys
p = sys.argv[1]
s = open(p).read()
if 'ENABLE_IPCM' not in s:
    s = s.replace('#endif // MINIVIDEO_SETTINGS_H',
                  '#define ENABLE_IPCM 1\n#endif // MINIVIDEO_SETTINGS_H')
    open(p, 'w').write(s)
EOP
  cd "$DST/build"
  cmake .. -DCMAKE_BUILD_TYPE=Release > /dev/null
  make -j"$(nproc)" > /dev/null
  cp -r /root/reference/mini_thumbnailer /tmp/thumb
  chmod -R u+w /tmp/thumb
  g++ -O2 -o /tmp/mini_thumbnailer /tmp/thumb/src/main.cpp \
      -I"$DST/src" -L"$DST/build" -lminivideo -Wl,-rpath,"$DST/build" \
      2> /dev/null
fi
echo "reference oracle at /tmp/mini_thumbnailer"
