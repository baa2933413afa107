#!/bin/bash
# Static-analysis gate (the reference's cppcheck/doxygen equivalent,
# SURVEY.md §4: doc/generate_cppcheck.sh).  This image ships no Python
# linters, so the gate is: compileall (syntax), the C++ build at -Wall
# -Wextra treated as errors, and import health of every module.
set -e
cd "$(dirname "$0")/.."

echo "== python syntax (compileall)"
python -m compileall -q minivideo_tpu tests tools bench.py __graft_entry__.py

echo "== native build, warnings as errors"
make -C minivideo_tpu/native clean > /dev/null 2>&1 || true
make -C minivideo_tpu/native CXXFLAGS_EXTRA="-Werror" 2>&1 | grep -v "^make" || true
test -f minivideo_tpu/native/libminivideo_native.so

echo "== import health"
JAX_PLATFORMS=cpu python - <<'EOF'
import importlib, pkgutil, jax
jax.config.update("jax_platforms", "cpu")
import minivideo_tpu
bad = []
for m in pkgutil.walk_packages(minivideo_tpu.__path__, "minivideo_tpu."):
    if "libminivideo" in m.name:
        continue            # the C shared library, not a Python module
    try:
        importlib.import_module(m.name)
    except Exception as e:  # noqa: BLE001
        bad.append((m.name, e))
assert not bad, bad
print(f"all minivideo_tpu modules import cleanly")
EOF

echo "== AddressSanitizer gate (native lib over valid+mutated inputs)"
bash tools/asan_check.sh 3 | tail -1

echo "== packaging: fresh-venv editable install + CLI smoke"
# offline install: a .pth link to the parent env supplies
# numpy/jax/setuptools (venv-from-venv: --system-site-packages would
# point at the BASE interpreter, not /opt/venv), --no-index proves
# nothing is fetched (this image has zero egress)
VENV=$(mktemp -d)/venv
python -m venv "$VENV"
PARENT_SITE=$(python -c "import numpy, os; print(os.path.dirname(os.path.dirname(numpy.__file__)))")
VENV_SITE=$("$VENV/bin/python" -c "import site; print(site.getsitepackages()[0])")
echo "$PARENT_SITE" > "$VENV_SITE/parent_env.pth"
"$VENV/bin/pip" install -q -e . --no-build-isolation --no-index
"$VENV/bin/mv-thumbnail" --help > /dev/null
"$VENV/bin/mv-extract" --help > /dev/null
"$VENV/bin/mv-analyse" --help > /dev/null
PYTHONPATH=tests "$VENV/bin/python" - <<'EOF'
import subprocess, sys, tempfile, os
from fixtures.h264enc import make_stream
d = tempfile.mkdtemp()
clip = os.path.join(d, "clip.264")
open(clip, "wb").write(make_stream(width_mbs=4, height_mbs=3,
                                   n_pictures=1, seed=5,
                                   mb_kinds=("i16",), density=0.2,
                                   allow_pcm=False))
exe = os.path.join(os.path.dirname(sys.executable), "mv-thumbnail")
r = subprocess.run([exe, "-i", clip, "-o", d, "-f", "bmp"],
                   capture_output=True, text=True)
assert r.returncode == 0, r.stderr
out = r.stdout.strip()
assert os.path.getsize(out) > 54, out
print("console-script thumbnail run OK:", os.path.basename(out))
EOF
rm -rf "$(dirname "$VENV")"

echo "lint: OK"
