#!/bin/sh
# CI pipeline (the analogue of the reference's .travis.yml:31-34 test stage):
# build the native engine, verify constants, run the test groups SERIALLY in
# small batches (XLA compiles dominate on small hosts; never run two
# jax-importing processes concurrently -- see docs/DESIGN.md).
set -e
cd "$(dirname "$0")"

echo "== native build =="
./native/build.sh

echo "== constants verification =="
python tools/constants_gen.py > /dev/null && python tools/derive_curve.py > /dev/null && echo ok

echo "== tests (serial groups) =="
python -m pytest tests/test_oracle.py tests/test_constants.py -q
python -m pytest tests/test_field.py -q
python -m pytest tests/test_scalar.py tests/test_points.py -q
python -m pytest tests/test_msm.py tests/test_sharding.py -q
python -m pytest tests/test_pallas.py -q

echo "== bench (smoke, CPU) =="
JAX_PLATFORMS=cpu BENCH_BATCH=128 python bench.py
echo "CI OK"
