"""Analytic golden fixtures for the contact/constraint solver.

pymunk/Chipmunk is not installable in this image (zero egress — see
STATUS.md "parity evidence"), so these tests pin the solver to *closed
forms derived by hand from Chipmunk's documented constraint algebra*
(the semantics the reference runs through pymunk 5.6):

- a cpConstraint applies at most ``max_force * dt`` of impulse per step
  (cpConstraint.maxForce; the top-down friction emulation of
  /root/reference/magical/entities.py:703-711 depends on exactly this),
- penetration resolves through pseudo-velocities at a geometric rate of
  ``1 - (1 - 0.1)^(60 dt)`` of the overlap beyond collision_slop per
  step (cpSpaceStep.c arbiter prestep, slop from base_env.py:194-196),
  without injecting real momentum.

The expected trajectories below are computed from those formulas alone,
NOT from running our solver — so they would catch a clamp applied
per-iteration instead of per-step, a bias leak into real velocity, or a
wrong slop sign.  Substep ordering is Chipmunk 7's cpSpaceStep:
positions integrate FIRST with the incoming (v + v_bias), pseudo-
velocities reset, then the velocity solve runs — so substep k's solve
moves positions during substep k+1's integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magical_tpu import constants as C
from magical_tpu import geometry as G
from magical_tpu.core import physics as P
from magical_tpu.core import state as S

A = {n: i for i, n in enumerate(C.ACTION_NAMES)}
IDLE = A['Open']        # no thrust, no turn (robot is parked far away)
BLOCK0 = S.N_ROBOT_BODIES


@pytest.fixture(scope='module')
def step():
    return jax.jit(P.control_step, static_argnums=())


def _lone_block_state(shape_type, vel=(0.0, 0.0), omega=0.0):
    """Robot parked in a far corner; one block at the centre with the
    given initial velocity — the only active constraints on the block
    are its translational/rotational damping joints."""
    st = S.place_robot(S.make_initial_state(1, 1), (-0.75, -0.75), 0.0)
    st = S.place_block(st, 0, (0.0, 0.0), 0.0, int(shape_type), 0)
    st = st.replace(
        vel=st.vel.at[BLOCK0].set(jnp.asarray(vel, jnp.float32)),
        omega=st.omega.at[BLOCK0].set(jnp.float32(omega)))
    return st


def test_translational_damping_is_maxforce_dt_clamped(step):
    # PivotJoint to static, max_force = 1.5 (entities.py:703-706):
    # each substep removes exactly min(|v|, F dt / m) of speed.
    v0 = 0.5
    st = _lone_block_state(C.ShapeType.CIRCLE, vel=(v0, 0.0))
    dv = C.PHYS_VAR_DEFAULTS[C.PV_SHAPE_TRANS_FORCE] * C.DT / C.SHAPE_MASS

    v_exp, x_exp = v0, 0.0
    for _ in range(C.PHYS_STEPS):                   # one control step
        x_exp += v_exp * C.DT                       # integrate first...
        v_exp = max(0.0, v_exp - dv)                # ...then solve
    out = step(st, IDLE)
    np.testing.assert_allclose(float(out.vel[BLOCK0, 0]), v_exp,
                               atol=1e-6)
    np.testing.assert_allclose(float(out.pos[BLOCK0, 0]), x_exp,
                               atol=1e-6)
    assert abs(float(out.vel[BLOCK0, 1])) < 1e-7    # no lateral leak

    # second control step drives it to a dead stop (v0 < 20 dv)
    out2 = step(out, IDLE)
    assert abs(float(out2.vel[BLOCK0, 0])) < 1e-7


def test_rotational_damping_is_maxforce_dt_clamped(step):
    # GearJoint to static, max_force = 0.1 (entities.py:708-711):
    # each substep removes exactly min(|w|, F dt / I) of spin.
    w0 = 2.0
    st = _lone_block_state(C.ShapeType.SQUARE, omega=w0)
    inertia = float(np.asarray(G.BLOCK_MOMENT)[int(C.ShapeType.SQUARE)])
    dw = C.PHYS_VAR_DEFAULTS[C.PV_SHAPE_ROT_FORCE] * C.DT / inertia

    w_exp, a_exp = w0, 0.0
    for _ in range(C.PHYS_STEPS):
        a_exp += w_exp * C.DT                       # integrate first...
        w_exp = max(0.0, w_exp - dw)                # ...then solve
    out = step(st, IDLE)
    np.testing.assert_allclose(float(out.omega[BLOCK0]), w_exp,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(out.angle[BLOCK0]), a_exp,
                               rtol=1e-5, atol=1e-6)
    # spin must not translate the block
    np.testing.assert_allclose(np.asarray(out.pos[BLOCK0]), [0.0, 0.0],
                               atol=1e-7)


def test_penetration_resolves_at_chipmunk_bias_rate(step):
    # Two resting circles overlapping by depth0 > slop: pseudo-velocity
    # bias separates them by beta * (depth - slop) per substep, beta =
    # 1 - (1-0.1)^(60 dt), and leaves REAL velocities untouched.
    r = C.SHAPE_RAD
    depth0 = 0.05
    st = S.place_robot(S.make_initial_state(2, 1), (-0.75, -0.75), 0.0)
    st = S.place_block(st, 0, (-(r - depth0 / 2), 0.0), 0.0,
                       int(C.ShapeType.CIRCLE), 0)
    st = S.place_block(st, 1, (+(r - depth0 / 2), 0.0), 0.0,
                       int(C.ShapeType.CIRCLE), 1)

    beta = C.bias_coef(C.COLLISION_BIAS, C.DT)
    # integration precedes the solve, so the k-th substep's bias moves
    # positions at substep k+1: only 9 corrections land within one
    # control step (the 10th rides in the carried v_bias state).
    d_exp = depth0
    for _ in range(C.PHYS_STEPS - 1):
        d_exp = C.COLLISION_SLOP + (1.0 - beta) * max(
            0.0, d_exp - C.COLLISION_SLOP)
    out = step(st, IDLE)
    gap = float(out.pos[BLOCK0 + 1, 0] - out.pos[BLOCK0, 0])
    depth = 2 * r - gap
    np.testing.assert_allclose(depth, d_exp, atol=2e-4)
    # bias must not inject real momentum (Chipmunk pseudo-velocities)
    assert float(jnp.abs(out.vel[BLOCK0:BLOCK0 + 2]).max()) < 1e-5
    # symmetric split: equal masses move by equal amounts
    np.testing.assert_allclose(float(out.pos[BLOCK0, 0]),
                               -float(out.pos[BLOCK0 + 1, 0]), atol=1e-6)
