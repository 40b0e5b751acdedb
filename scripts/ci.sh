#!/usr/bin/env bash
# CI entrypoint (the reference drives 2-Build.sh + CMake tests; here: bytecode check,
# native shim build, fast test suite). Run the slow sweeps with: pytest tests/ -m "".
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== byte-compile =="
python -m compileall -q nrdtpu bench.py __graft_entry__.py

echo "== native shim =="
make -C native

echo "== fast tests =="
# hard wall-time bar (VERDICT r2 ask #7): the default suite must stay usable as
# a pre-commit gate - 10 min cold-cache ceiling; warm-cache target is < 5 min
timeout 600 env JAX_PLATFORMS=cpu python -m pytest tests/ -q

echo "CI OK"
