"""Runtime state validation (jit-safe guards).

The reference's closest analogues are its runtime asserts — score range
(base_env.py:277-278), name-grammar round-trip, PlacementError
(SURVEY.md §5).  The batched engine adds NaN/overflow guards over the
physics state that can run inside jit via checkify, plus a host-side
validator for tests and debugging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu.core.state import EnvState

# generous dynamics envelope: robot max speed 0.8; solver-impulse spikes
# during deep contact resolution stay far below these
MAX_SPEED = 50.0
MAX_OMEGA = 200.0
POS_BOUND = 60.0          # arena is [-1,1]; parked blocks sit near 50


def state_finite(state: EnvState):
    """jit-safe: True iff the state is finite and within envelope."""
    ok = jnp.isfinite(state.pos).all() & jnp.isfinite(state.vel).all() \
        & jnp.isfinite(state.angle).all() & jnp.isfinite(state.omega).all()
    ok &= (jnp.abs(state.vel) < MAX_SPEED).all()
    ok &= (jnp.abs(state.omega) < MAX_OMEGA).all()
    ok &= (jnp.abs(state.pos) < POS_BOUND).all()
    return ok


def checkify_step(step_fn):
    """Wrap a step function with checkify NaN/bound assertions."""
    from jax.experimental import checkify

    def checked(*args, **kwargs):
        out = step_fn(*args, **kwargs)
        state = out[0].state if hasattr(out[0], 'state') else out[0]
        checkify.check(state_finite(state),
                       'physics state became invalid (NaN/overflow)')
        return out

    return checkify.checkify(checked)


def assert_valid_host(state: EnvState, where=''):
    """Host-side validator with a readable report (for tests/tools)."""
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    problems = []
    if not np.isfinite(pos).all():
        problems.append('non-finite positions')
    if not np.isfinite(vel).all():
        problems.append('non-finite velocities')
    if np.abs(vel).max(initial=0) >= MAX_SPEED:
        problems.append(f'velocity blow-up (max {np.abs(vel).max():.1f})')
    if problems:
        raise AssertionError(f'invalid state {where}: ' + '; '.join(problems))


def assert_placements_ok(state: EnvState, where=''):
    """Host-side: no reset placement fell back to a colliding pose.

    Replaces the reference's PlacementError signal (geom.py:111-113) for
    the batched engine: task resets count failed placements in
    ``EnvState.place_fail`` and steps surface it via
    ``info['n_placement_failures']``.
    """
    fails = np.asarray(state.place_fail)
    if fails.any():
        n_envs = int((fails > 0).sum()) if fails.ndim else 1
        raise AssertionError(
            f'placement failure {where}: {int(fails.sum())} entities in '
            f'{n_envs} env(s) kept a possibly-colliding pose')
