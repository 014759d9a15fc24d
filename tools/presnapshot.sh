#!/usr/bin/env bash
# Pre-snapshot gate: run before ANY end-of-round (or otherwise final)
# commit. A round was once voided by a helper extraction committed
# without compiling — this script is the "never again".
#
# Usage:
#   tools/presnapshot.sh           # full gate: sbt test (compile + all specs)
#   tools/presnapshot.sh compile   # minimum gate: sbt compile only
#
# Exit 0 iff the gate passes; commit only on exit 0.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-test}" == "compile" ]]; then
  sbt -batch compile
else
  sbt -batch test
fi
echo "presnapshot: gate passed ($(git rev-parse --short HEAD) + working tree)"
