#!/bin/sh
# CI pipeline (the analogue of the reference's .travis.yml:31-34 test stage):
# build the native engine, verify constants, run the test groups SERIALLY in
# small batches (XLA compiles dominate on small hosts; never run two
# jax-importing processes concurrently -- see docs/DESIGN.md).
set -e
cd "$(dirname "$0")"

echo "== native build =="
./native/build.sh

# CPU-only work bypasses the axon TPU tunnel entirely (the sitecustomize
# handshake at interpreter start can wedge; see CLAUDE.md).
PYCPU="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python"

echo "== constants verification =="
$PYCPU tools/constants_gen.py > /dev/null && $PYCPU tools/derive_curve.py > /dev/null && echo ok

echo "== tests (serial groups) =="
$PYCPU -m pytest tests/test_oracle.py tests/test_constants.py -q
$PYCPU -m pytest tests/test_field.py -q
$PYCPU -m pytest tests/test_field_f9.py -q
$PYCPU -m pytest tests/test_scalar.py tests/test_points.py -q
$PYCPU -m pytest tests/test_msm.py tests/test_sharding.py -q
$PYCPU -m pytest tests/test_pallas.py tests/test_protocols.py -q
$PYCPU -m pytest tests/test_serving.py tests/test_native.py -q
$PYCPU -m pytest tests/test_surface.py tests/test_backend.py -q
$PYCPU -m pytest tests/test_distributed.py -q  # real 2-process jax.distributed

echo "== bench (smoke, CPU) =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu BENCH_FORCE_CPU=1 BENCH_BATCH=128 BENCH_MSM_N=512 BENCH_TIMEOUT=300 python bench.py
echo "CI OK"
