"""Multi-process `jax.distributed` exercise (SURVEY.md §4: multi-host
testing on the CPU backend).

Launches 2 real OS processes, each a `jax.distributed` participant with
4 virtual CPU devices (global mesh = 8 devices over 2 processes), and
runs the sharded rollout + BC step through parallel/multihost.py.
Asserts identical global key assignment and that the BC gradient psum
leaves both processes with identical parameters.

The reference has no distributed layer at all (its only multi-process
anything is pytest-xdist, /root/reference/.circleci/config.yml:16).
"""
import json
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WORKER = os.path.join(HERE, '_distributed_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    # Clean CPU-only JAX subprocess: drop the axon TPU plugin trigger
    # (sitecustomize registers it off PALLAS_AXON_POOL_IPS; see CLAUDE.md)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env['JAX_COMPILATION_CACHE_DIR'] = '/root/.cache/jaxcc'
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    return env


def test_two_process_distributed(tmp_path):
    nproc = 2
    coord = f'127.0.0.1:{_free_port()}'
    outs = [str(tmp_path / f'worker{i}.json') for i in range(nproc)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, str(nproc), str(i), outs[i]],
        env=_worker_env(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for i in range(nproc)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors='replace'))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f'worker failed:\n{log[-4000:]}'

    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))

    for r in results:
        assert r['process_count'] == nproc
        assert r['n_global_devices'] == 8
        assert r['keys_ok'], 'global key assignment differs across hosts'
        assert r['loss'] == r['loss'] and r['loss'] > 0   # finite
    # psum'd update -> bit-identical replicated params on both hosts
    assert results[0]['param_sum'] == results[1]['param_sum']
    # rollout advanced identically-visible global state on both hosts
    assert results[0]['pos_sum'] == pytest.approx(results[1]['pos_sum'])
