"""Physics behaviour tests: robot control semantics, containment,
pushing, stability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magical_tpu import constants as C
from magical_tpu.core import physics as P
from magical_tpu.core import state as S

A = {n: i for i, n in enumerate(C.ACTION_NAMES)}


@pytest.fixture(scope='module')
def step():
    return jax.jit(P.control_step)


@pytest.fixture(scope='module')
def base_state():
    st = S.make_initial_state(1, 1)
    return S.place_robot(st, (0.0, 0.0), 0.0)


def test_robot_drives_forward(step, base_state):
    # 7 steps: the finger tips (~0.36 ahead of the body centre) reach the
    # top wall during step 8, so stop just short of contact here (the
    # wall interaction itself is covered by test_robot_wall_recoil).
    s = base_state
    for _ in range(7):
        s = step(s, A['UpOpen'])
    pos = np.asarray(s.pos[0])
    # robot faces +y at angle 0 (velocity = rotation of (0, speed))
    assert pos[1] > 0.4
    assert abs(pos[0]) < 0.02
    # speed approaches the UP target (4 * radius = 0.8), force-limited
    assert 0.3 < float(s.vel[0, 1]) <= 0.85


def test_robot_wall_recoil(step, base_state):
    """Driving fingers-first into a wall: the error_bias=0 finger pin
    joints snap the body back (full -dist/dt bias correction, the
    reference's settings, entities.py:334-341) but the robot must stay
    inside the arena and the recoil speed is bounded by the servo
    target."""
    s = base_state
    for _ in range(16):
        s = step(s, A['UpOpen'])
        # never penetrates: finger tips reach ~0.37 beyond the centre
        assert float(s.pos[0, 1]) < 0.67
        assert abs(float(s.vel[0, 1])) <= 1.0
    # still pressed near the wall region overall despite recoil cycles
    assert float(s.pos[0, 1]) > 0.35


def test_robot_reverses(step, base_state):
    s = base_state
    for _ in range(8):
        s = step(s, A['DownOpen'])
    assert float(s.pos[0, 1]) < -0.3


def test_robot_turns_left_at_gear_rate(step, base_state):
    s = base_state
    for _ in range(8):
        s = step(s, A['LeftOpen'])
    # heading servo limited to 2.5 rad/s (entities.py:261 max_bias)
    ang = float(s.angle[0])
    assert 1.5 < ang <= 2.6
    s2 = base_state
    for _ in range(8):
        s2 = step(s2, A['RightOpen'])
    assert -2.6 <= float(s2.angle[0]) < -1.5


def test_fingers_track_open_close(step, base_state):
    s = base_state
    for _ in range(4):
        s = step(s, A['Open'])
    rel = np.asarray(s.angle[1:3]) - float(s.angle[0])
    np.testing.assert_allclose(rel, [np.pi / 8, -np.pi / 8], atol=0.02)
    for _ in range(6):
        s = step(s, A['Close'])
    rel = np.asarray(s.angle[1:3]) - float(s.angle[0])
    np.testing.assert_allclose(rel, [0.0, 0.0], atol=0.02)


def test_wall_containment(step, base_state):
    s = base_state
    for _ in range(40):
        s = step(s, A['UpOpen'])
    # the robot (with fingers) must stop at the top wall, not escape
    assert float(s.pos[0, 1]) < 0.85
    assert abs(float(s.vel[0, 1])) < 0.05


def test_block_gets_pushed(step):
    st = S.make_initial_state(1, 1)
    st = S.place_robot(st, (0.0, 0.0), 0.0)
    st = S.place_block(st, 0, (0.0, 0.5), 0.0, int(C.ShapeType.SQUARE), 0)
    s = st
    for _ in range(8):
        s = step(s, A['UpOpen'])
    assert float(s.pos[5, 1]) > 0.7     # block pushed ahead of the robot
    # block stays in front of the robot (no tunnelling)
    assert float(s.pos[5, 1]) > float(s.pos[0, 1]) + C.ROBOT_RAD


def test_block_damping_stops_free_block(step):
    # top-down friction joints bring a moving block to rest
    # (entities.py:703-711)
    st = S.make_initial_state(1, 1)
    st = S.place_robot(st, (-0.8, -0.8), 0.0)
    st = S.place_block(st, 0, (0.0, 0.0), 0.0, int(C.ShapeType.CIRCLE), 0)
    st = st.replace(vel=st.vel.at[5].set(jnp.asarray([1.0, 0.0])))
    s = st
    for _ in range(8):
        s = step(s, A['Open'])
    assert abs(float(s.vel[5, 0])) < 0.05
    assert float(s.pos[5, 0]) < 0.5


def test_inactive_blocks_stay_parked(step):
    st = S.make_initial_state(3, 1)
    st = S.place_robot(st, (0.0, 0.0), 0.0)
    st = S.place_block(st, 0, (0.3, 0.3), 0.0, int(C.ShapeType.STAR), 0)
    s = st
    for _ in range(3):
        s = step(s, A['UpOpen'])
    parked = np.asarray(s.pos[6:8])
    assert np.all(parked[:, 0] > 10.0)
    assert np.all(np.abs(np.asarray(s.vel[6:8])) < 1e-6)


def test_no_energy_explosion(step):
    # dense scene stepped for 3 seconds with pushing: velocities bounded
    st = S.make_initial_state(4, 1)
    st = S.place_robot(st, (0.0, -0.4), 0.0)
    for i, shape in enumerate([C.ShapeType.SQUARE, C.ShapeType.STAR,
                               C.ShapeType.CIRCLE, C.ShapeType.PENTAGON]):
        st = S.place_block(st, i, (-0.15 + 0.12 * i, 0.0 + 0.05 * i),
                           0.2 * i, int(shape), i % 4)
    s = st
    for t in range(24):
        s = step(s, A['UpOpen'] if t % 3 else A['UpLeftClose'])
    assert float(jnp.abs(s.vel).max()) < 3.0
    assert float(jnp.abs(s.omega[:3]).max()) < 8.0
    assert float(jnp.abs(s.pos[:3]).max()) < 1.2


def test_vmap_batch_consistency(step):
    # a batch of identical envs stays in lockstep with the single env
    st = S.make_initial_state(1, 1)
    st = S.place_robot(st, (0.1, -0.2), 0.7)
    st = S.place_block(st, 0, (0.0, 0.4), 0.1, int(C.ShapeType.PENTAGON), 1)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape), st)
    bstep = jax.jit(jax.vmap(P.control_step, in_axes=(0, None)))
    s1 = step(st, A['UpLeftOpen'])
    sb = bstep(batch, A['UpLeftOpen'])
    np.testing.assert_allclose(np.asarray(sb.pos[2]), np.asarray(s1.pos),
                               atol=1e-5)
