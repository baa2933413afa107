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
