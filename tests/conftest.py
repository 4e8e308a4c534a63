import os
from pathlib import Path

import pytest

# Multi-device sharding tests run on a virtual 8-device CPU mesh; the real-TPU
# bench path is exercised by bench.py, not pytest.
# The axon site hook pins JAX_PLATFORMS=axon at interpreter start (env vars
# set afterwards are ignored); jax.config.update is the only override that
# still works here. Without it every compile goes through the remote TPU
# tunnel (minutes of latency per program).
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: the suite is compile-bound (tiny inputs, many
# jitted programs); warm reruns skip straight to execution.
from abacusutils_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()


# The reference test-fixture tree (Mini_N64_L32 sim, golden files). Read-only.
TESTDATA = Path(os.environ.get('ABACUSUTILS_TPU_TESTDATA', '/root/reference/tests'))


@pytest.fixture(scope='session')
def testdata():
    if not TESTDATA.is_dir():
        pytest.skip(f'test data dir {TESTDATA} not found')
    return TESTDATA


@pytest.fixture(scope='session')
def example_sim(testdata):
    return testdata / 'Mini_N64_L32'


@pytest.fixture(scope='session')
def refdir(testdata):
    return testdata / 'ref_data'
