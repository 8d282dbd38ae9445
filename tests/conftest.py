import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Persistent compile cache: TPU (and tunnel-attached) compiles are slow;
# cached executables make repeat test runs fast.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

# Pin tests to the XLA physics/render paths: the Pallas kernels are
# cross-validated explicitly, and their first-compile latency on the
# tunnel-attached runtime would dominate suite time.
os.environ.setdefault('MAGICAL_TPU_PALLAS', '0')

# To run the sharding tests against a virtual multi-device CPU mesh
# (as the driver's dryrun does), set:
#   MAGICAL_TPU_TEST_CPU=1  ->  JAX_PLATFORMS=cpu + 8 host devices
if os.environ.get('MAGICAL_TPU_TEST_CPU'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jaxcc')

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: long-running test (set MAGICAL_TPU_FULL_TESTS=1)')


def pytest_collection_modifyitems(config, items):
    if os.environ.get('MAGICAL_TPU_FULL_TESTS'):
        return
    skip = pytest.mark.skip(
        reason='slow; set MAGICAL_TPU_FULL_TESTS=1 to run')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)
