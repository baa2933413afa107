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

echo "lint: OK"
