"""Env-name grammar + registry parity with the reference counts."""

import pytest

import magical_tpu
from magical_tpu.api.names import EnvName, update_magical_env_name


@pytest.fixture(scope='module', autouse=True)
def _registered():
    magical_tpu.register_envs()


def test_registered_env_counts():
    # 60 base IDs x (1 + 5 preprocs) + 6 debug = 366
    # (benchmarks/__init__.py:976-1047)
    assert len(magical_tpu.ALL_REGISTERED_ENVS) == 366
    base = [n for n in magical_tpu.ALL_REGISTERED_ENVS
            if EnvName(n).preproc is None]
    assert len(base) == 60


def test_variant_coverage():
    names = set(magical_tpu.ALL_REGISTERED_ENVS)
    # MoveToCorner has no TestLayout/TestCountPlus (README parity)
    assert 'MoveToCorner-TestJitter-v0' in names
    assert 'MoveToCorner-TestLayout-v0' not in names
    assert 'MoveToCorner-TestCountPlus-v0' not in names
    # MoveToRegion has no TestShape/TestCountPlus
    assert 'MoveToRegion-TestShape-v0' not in names
    assert 'MoveToRegion-TestLayout-v0' in names
    # full-variant tasks have all 8
    for v in ('Demo', 'TestJitter', 'TestColour', 'TestShape', 'TestLayout',
              'TestCountPlus', 'TestDynamics', 'TestAll'):
        assert f'MatchRegions-{v}-v0' in names
    assert 'MoveToCorner-Demo-DebugReward-v0' in names
    assert 'MoveToCorner-Demo-DebugReward-LoResStack-v0' in names


def test_demo_to_test_map():
    m = magical_tpu.DEMO_ENVS_TO_TEST_ENVS_MAP
    assert len(m) == 48  # 8 tasks x 6 pipelines (raw + 5 preprocs)
    tests = m['MoveToCorner-Demo-v0']
    assert set(tests) == {
        'MoveToCorner-TestColour-v0', 'MoveToCorner-TestShape-v0',
        'MoveToCorner-TestJitter-v0', 'MoveToCorner-TestDynamics-v0',
        'MoveToCorner-TestAll-v0'}
    tests4e = m['MatchRegions-Demo-LoRes4E-v0']
    assert len(tests4e) == 7
    assert all(EnvName(t).preproc == 'LoRes4E' for t in tests4e)


def test_name_grammar_roundtrip():
    n = EnvName('ClusterShape-TestCountPlus-LoResCHW4E-v0')
    assert n.task == 'ClusterShape'
    assert n.variant == 'TestCountPlus'
    assert n.preproc == 'LoResCHW4E'
    assert n.version == 'v0'
    assert n.is_test
    assert n.demo_env_name == 'ClusterShape-Demo-LoResCHW4E-v0'
    assert update_magical_env_name(
        'MoveToCorner-Demo-v0', preproc='LoResStack') == \
        'MoveToCorner-Demo-LoResStack-v0'
    assert update_magical_env_name(
        'MoveToCorner-Demo-LoResStack-v0', variant='TestAll') == \
        'MoveToCorner-TestAll-LoResStack-v0'
    with pytest.raises(ValueError):
        EnvName('NotAnEnvName')


def test_splice_in_preproc_name():
    assert magical_tpu.splice_in_preproc_name(
        'MoveToCorner-Demo-v0', 'LoResStack') == \
        'MoveToCorner-Demo-LoResStack-v0'
    with pytest.raises(AssertionError):
        magical_tpu.splice_in_preproc_name('MoveToCorner-Demo-v0', 'Nope')
