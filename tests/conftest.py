import os
from pathlib import Path

import pytest

# Multi-device sharding tests run on a virtual 8-device CPU mesh; the real-TPU
# bench path is exercised by bench.py, not pytest.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

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
