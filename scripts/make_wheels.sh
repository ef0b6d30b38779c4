#!/usr/bin/env bash
# Build distributable wheels, mirroring the intent of the reference's
# docker/make_wheels.sh (ska-sdp-func-radler/docker/make_wheels.sh): one
# artifact per interpreter line.  radler-tpu is pure Python plus one
# optional C++ host helper library, so no manylinux containers are needed —
# the .so is built here and bundled as package data.
set -euo pipefail
cd "$(dirname "$0")/.."

make -C native
mkdir -p radler_tpu/_native
cp native/libradler_host.so radler_tpu/_native/

python -m build --wheel --sdist

# The bundled library is a build artifact, not source.
rm -rf radler_tpu/_native
echo "wheels in dist/:"
ls -l dist/
