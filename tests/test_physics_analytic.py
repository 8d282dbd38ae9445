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


def _robot_only_state(pos=(0.0, 0.0), angle=0.0):
    return S.place_robot(S.make_initial_state(1, 1), pos, angle)


def test_pivot_servo_accelerates_at_maxforce_over_system_mass(step):
    # Driving UP: the control PivotJoint (max_bias=0, max_force=3,
    # entities.py:255-258) applies at most F*dt of impulse per substep.
    # The pin-jointed fingers ride along, so the whole 1 + 2*(1/8) mass
    # system gains exactly F*dt/1.25 of speed per substep while below
    # the 4*ROBOT_RAD target speed.
    st = _robot_only_state()
    m_eff = C.ROBOT_MASS + 2 * C.FINGER_MASS
    dv = C.PHYS_VAR_DEFAULTS[C.PV_ROBOT_POS_FORCE] * C.DT / m_eff
    target = 4 * C.ROBOT_RAD

    v_exp, y_exp = 0.0, 0.0
    for _ in range(C.PHYS_STEPS):
        y_exp += v_exp * C.DT                      # integrate first...
        v_exp = min(target, v_exp + dv)            # ...then solve
    out = step(st, A['UpOpen'])
    # heading 0 -> motion along +y (control velocity is body-frame
    # (0, target) rotated to world; entities.py:459-479).
    # The EXACT invariant is momentum: only the pivot joint injects
    # any, at its full F*dt budget per substep (far below target).
    momentum = (C.ROBOT_MASS * float(out.vel[0, 1])
                + C.FINGER_MASS * float(out.vel[1, 1])
                + C.FINGER_MASS * float(out.vel[2, 1]))
    np.testing.assert_allclose(
        momentum, C.PHYS_STEPS
        * C.PHYS_VAR_DEFAULTS[C.PV_ROBOT_POS_FORCE] * C.DT, rtol=1e-5)
    # the system moves together up to GS convergence (~2%)
    np.testing.assert_allclose(float(out.vel[0, 1]), v_exp, rtol=1e-2)
    np.testing.assert_allclose(float(out.pos[0, 1]), y_exp, rtol=2e-2)
    assert abs(float(out.vel[0, 0])) < 1e-4
    np.testing.assert_allclose(np.asarray(out.vel[1:3, 1]),
                               [v_exp, v_exp], rtol=3e-2)


def test_gear_servo_max_bias_caps_turn_rate(step):
    # Turning LEFT sets a +1.5 rad heading error each substep; the servo
    # GearJoint has error_bias=0 and max_bias=2.5 (entities.py:259-263),
    # so the error-driven target velocity is clipped at 2.5 rad/s, and
    # max_force=1 is ample to hold the robot there: steady-state omega
    # is exactly the max_bias.
    st = _robot_only_state()
    out = st
    for _ in range(4):
        out = step(out, A['LeftOpen'])
    np.testing.assert_allclose(float(out.omega[0]), C.ROBOT_GEAR_MAX_BIAS,
                               rtol=2e-2)
    assert float(out.angle[0]) > 0.0               # LEFT = positive turn
    # one more control step advances the heading by ~omega * 10 dt
    out2 = step(out, A['LeftOpen'])
    np.testing.assert_allclose(
        float(out2.angle[0] - out.angle[0]),
        C.ROBOT_GEAR_MAX_BIAS * C.DT * C.PHYS_STEPS, rtol=3e-2)


def test_finger_motor_rate_clamp_and_rotary_limit(step):
    # Fingers start at the open limit (+-pi/8).  CLOSE sets the target
    # to the inner limit; the SimpleMotor runs at rate
    # clip(10 * err, -1, 1) rad/s (entities.py:459-479), so a full
    # control step closes ~1 rad/s * 10 dt = 0.125 rad, and the
    # RotaryLimitJoint stops the travel exactly at 0.
    st = _robot_only_state()
    rel0 = float(st.angle[1] - st.angle[0])
    np.testing.assert_allclose(rel0, C.FINGER_ROT_LIMIT_OUTER, atol=1e-6)

    out = step(st, A['Close'])
    rel1 = float(out.angle[1] - out.angle[0])
    # while |err| > 0.1 the rate clamp binds at exactly 1 rad/s; the
    # final substep's velocity lands in the next step's integration
    travel = C.DT * (C.PHYS_STEPS - 1)
    np.testing.assert_allclose(rel0 - rel1, travel, rtol=2e-2)
    # mirrored finger
    np.testing.assert_allclose(
        float(out.angle[2] - out.angle[0]), -(rel0 - travel), rtol=2e-2)

    # drive to the inner limit and assert it holds exactly there
    for _ in range(6):
        out = step(out, A['Close'])
    np.testing.assert_allclose(float(out.angle[1] - out.angle[0]),
                               C.FINGER_ROT_LIMIT_INNER, atol=2e-3)
    # and back to the outer limit
    for _ in range(6):
        out = step(out, A['Open'])
    np.testing.assert_allclose(float(out.angle[1] - out.angle[0]),
                               C.FINGER_ROT_LIMIT_OUTER, atol=2e-3)


@pytest.mark.parametrize('angle', [0.0, np.pi / 4])
def test_bevelled_square_rests_at_slop_against_wall(step, angle):
    # A Poly.create_box square has verts inset by the bevel radius with
    # radius = bevel (entities.py:620-634), so its support against the
    # wall is the full half-extent; penetration resolves until exactly
    # `slop` of overlap remains, with no real momentum injected
    # (restitution-0 wall, pseudo-velocity bias only).
    sq = int(C.ShapeType.SQUARE)
    verts = np.asarray(G.BLOCK_VERTS)[sq, 0]
    nv = int(np.asarray(G.BLOCK_SUB_NV)[sq, 0])
    rad = float(np.asarray(G.BLOCK_SUB_RADIUS)[sq, 0])
    c, s = np.cos(angle), np.sin(angle)
    R = np.asarray([[c, -s], [s, c]])
    support = -min((verts[:nv] @ R.T)[:, 0]) + rad   # left half-extent

    depth0 = 0.04
    x0 = -1.0 + support - depth0
    st = S.place_robot(S.make_initial_state(1, 1), (0.75, 0.75), 0.0)
    st = S.place_block(st, 0, (x0, 0.0), angle, sq, 0)
    out = st
    # bias converges geometrically at beta ~ 7.6%/substep, so run to
    # within float tolerance of the slop depth
    for _ in range(10):
        out = step(out, IDLE)
    x_rest = -1.0 + support - C.COLLISION_SLOP
    np.testing.assert_allclose(float(out.pos[BLOCK0, 0]), x_rest,
                               atol=3e-4)
    assert float(jnp.abs(out.vel[BLOCK0]).max()) < 1e-5   # no bounce
    np.testing.assert_allclose(float(out.angle[BLOCK0]), angle, atol=1e-4)


def test_wall_recoil_is_inelastic(step):
    # A circle thrown at the wall must stop dead (restitution 0): the
    # normal impulse absorbs the incoming momentum, the bias separates
    # it back to slop depth, and no positive rebound velocity appears.
    r = C.SHAPE_RAD
    st = S.place_robot(S.make_initial_state(1, 1), (0.75, 0.75), 0.0)
    st = S.place_block(st, 0, (-1.0 + r + 0.02, 0.0), 0.0,
                       int(C.ShapeType.CIRCLE), 0)
    st = st.replace(vel=st.vel.at[BLOCK0].set(jnp.asarray([-1.0, 0.0])))

    # 1-D closed-form replica of the Chipmunk substep for this scenario:
    # integrate with (v + v_bias), then the contact kills any inward
    # real velocity (restitution 0) and emits a pseudo-velocity that
    # resolves depth beyond slop; the damping joint removes at most
    # F*dt/m of speed while airborne.
    beta = C.bias_coef(C.COLLISION_BIAS, C.DT)
    dv = C.PHYS_VAR_DEFAULTS[C.PV_SHAPE_TRANS_FORCE] * C.DT / C.SHAPE_MASS
    x, v, vb = float(st.pos[BLOCK0, 0]), -1.0, 0.0
    n_ctrl = 4
    for _ in range(n_ctrl * C.PHYS_STEPS):
        x += (v + vb) * C.DT
        sep = (x - r) + 1.0
        if sep < 0.0:
            v = max(v, 0.0)                     # normal impulse, jn >= 0
            vb = beta * max(0.0, -sep - C.COLLISION_SLOP) / C.DT
        else:
            v = np.sign(v) * max(0.0, abs(v) - dv)
            vb = 0.0

    out = st
    low_water = 0.0
    for _ in range(n_ctrl):
        out = step(out, IDLE)
        low_water = min(low_water, float(out.pos[BLOCK0, 0]))
    # never tunnels through, rests where the replica says (depth <=
    # slop: the bias never pulls it back IN to slop depth if the
    # impulse stopped it short)
    assert low_water > -1.0
    np.testing.assert_allclose(float(out.pos[BLOCK0, 0]), x, atol=5e-4)
    depth = -((float(out.pos[BLOCK0, 0]) - r) + 1.0)
    assert -1e-4 <= depth <= C.COLLISION_SLOP + 1e-4
    assert abs(float(out.vel[BLOCK0, 0])) < 1e-4


# ---------------------------------------------------------------------------
# Independent-oracle scenarios (multi-body cases beyond the closed forms)
# ---------------------------------------------------------------------------
#
# chipmunk_oracle.py is a second, from-scratch implementation of
# Chipmunk's published pipeline (per-body numpy, true Gauss-Seidel over
# clipped contact manifolds) sharing no solver code with
# core/physics.py (vectorised mass-splitting Jacobi over SAT support
# points).  Agreement between the two on contact-rich multi-body
# scenarios is independent evidence for the Chipmunk semantics of
# /root/reference/magical/entities.py:217-490,584-761.  Tolerances
# absorb the documented manifold/sweep differences (docs/DESIGN.md) —
# they are far below task-relevant scales (SHAPE_RAD = 0.12).

import chipmunk_oracle as CO


def _oracle_compare(st, actions, tol_pos, tol_ang, step_fn=None):
    step_fn = step_fn or jax.jit(P.control_step)
    world, bmap = CO.from_env_state(st)
    sx = st
    for a in actions:
        sx = step_fn(sx, jnp.int32(a))
        world.control_step(a)
    px = np.asarray(sx.pos)[bmap]
    ax = np.asarray(sx.angle)[bmap]
    po = world.positions()
    ao = world.angles()
    # eyes (bodies 3, 4) are cosmetic point masses - compare but loosely
    main = [i for i in range(len(bmap)) if bmap[i] not in (3, 4)]
    np.testing.assert_allclose(px[main], po[main], atol=tol_pos,
                               err_msg='positions vs oracle')
    np.testing.assert_allclose(ax[main], ao[main], atol=tol_ang,
                               err_msg='angles vs oracle')
    return sx, world


def test_oracle_finger_grip_square(step):
    """Robot closes its fingers onto a square and drags it: pin +
    motor + rotary-limit joints against finger-block contacts."""
    st = S.place_robot(S.make_initial_state(1, 1), (0.0, 0.0), 0.0)
    st = S.place_block(st, 0, (0.0, 0.33), 0.0, int(C.ShapeType.SQUARE), 0)
    _oracle_compare(st, [A['UpClose']] * 3, tol_pos=2e-2, tol_ang=6e-2,
                    step_fn=step)


def test_oracle_two_block_push_chain(step):
    """Robot pushes a square into a circle: impulse propagates through
    a two-contact chain (robot->A->B)."""
    st = S.place_robot(S.make_initial_state(2, 1), (0.0, -0.5), 0.0)
    st = S.place_block(st, 0, (0.0, -0.13), 0.0, int(C.ShapeType.SQUARE), 0)
    st = S.place_block(st, 1, (0.0, 0.18), 0.0, int(C.ShapeType.CIRCLE), 1)
    _oracle_compare(st, [A['UpOpen']] * 3, tol_pos=2e-2, tol_ang=6e-2)


def test_oracle_wall_corner_resting(step):
    """A square thrown into the arena corner comes to rest against two
    walls (two simultaneous wall manifolds + slop depth)."""
    st = S.place_robot(S.make_initial_state(1, 1), (-0.75, -0.75), 0.0)
    st = S.place_block(st, 0, (0.8, 0.8), 0.0, int(C.ShapeType.SQUARE), 0)
    st = st.replace(vel=st.vel.at[BLOCK0].set(
        jnp.asarray([1.2, 1.2], jnp.float32)))
    sx, world = _oracle_compare(st, [IDLE] * 5, tol_pos=1e-2, tol_ang=4e-2,
                                step_fn=step)
    # both agree the block rests in the corner, inside the walls
    bp = np.asarray(sx.pos)[BLOCK0]
    assert bp[0] < 1.0 and bp[1] < 1.0
    assert bp[0] > 0.85 and bp[1] > 0.85


def test_oracle_star_pushed_by_robot(step):
    """Star block (6 convex sub-shapes) pushed by the robot: multi-
    sub-shape manifolds on one body."""
    st = S.place_robot(S.make_initial_state(1, 1), (0.0, 0.0), 0.0)
    st = S.place_block(st, 0, (0.0, 0.36), 0.1, int(C.ShapeType.STAR), 0)
    _oracle_compare(st, [A['UpOpen']] * 3, tol_pos=2e-2, tol_ang=0.1,
                    step_fn=step)


def test_oracle_circle_hits_pentagon(step):
    """Free circle-poly collision away from the robot (pure
    block-block contact + damping joints)."""
    st = S.place_robot(S.make_initial_state(2, 1), (-0.75, -0.75), 0.0)
    st = S.place_block(st, 0, (-0.25, 0.3), 0.0, int(C.ShapeType.CIRCLE), 0)
    st = S.place_block(st, 1, (0.12, 0.3), 0.2,
                       int(C.ShapeType.PENTAGON), 1)
    st = st.replace(vel=st.vel.at[BLOCK0].set(
        jnp.asarray([1.5, 0.0], jnp.float32)))
    _oracle_compare(st, [IDLE] * 3, tol_pos=1.5e-2, tol_ang=6e-2)


def test_oracle_robot_drives_into_wall(step):
    """Robot body circle + finger polys vs the wall: the servo pivot
    fights the wall contact."""
    st = S.place_robot(S.make_initial_state(0, 1), (0.0, 0.55), 0.0)
    sx, world = _oracle_compare(st, [A['UpOpen']] * 4, tol_pos=1.5e-2,
                                tol_ang=6e-2)
    # robot stopped by the wall, not through it
    assert float(sx.pos[0, 1]) < 1.0 - C.ROBOT_RAD + 0.05


def test_oracle_block_slides_along_wall(step):
    """Tangential sliding against a wall: friction impulse clamped by
    mu * jn while the damper drains momentum."""
    st = S.place_robot(S.make_initial_state(1, 1), (-0.75, -0.75), 0.0)
    st = S.place_block(st, 0, (0.0, 0.895), 0.0, int(C.ShapeType.SQUARE), 0)
    st = st.replace(vel=st.vel.at[BLOCK0].set(
        jnp.asarray([1.0, 0.2], jnp.float32)))
    _oracle_compare(st, [IDLE] * 4, tol_pos=1e-2, tol_ang=4e-2)


def test_oracle_matches_pallas_kernel_interpret():
    """The production Pallas kernel (via the interpreter) against the
    independent oracle on the finger-grip scenario — closes the loop
    XLA <-> kernel <-> oracle on a contact-rich multi-joint case."""
    import contextlib

    from magical_tpu.core import physics_pallas as PP

    @contextlib.contextmanager
    def interpret():
        old = PP.INTERPRET
        PP.INTERPRET = True
        PP._build.cache_clear()
        try:
            yield
        finally:
            PP.INTERPRET = old
            PP._build.cache_clear()

    st = S.place_robot(S.make_initial_state(1, 1), (0.0, 0.0), 0.0)
    st = S.place_block(st, 0, (0.0, 0.33), 0.0, int(C.ShapeType.SQUARE), 0)
    world, bmap = CO.from_env_state(st)
    B = 8
    sp = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
    with interpret():
        step_p = jax.jit(lambda s, a: PP.control_step_pallas(
            s, a, env_tile=B))
        acts = jnp.full((B,), A['UpClose'], jnp.int32)
        for _ in range(3):
            sp = step_p(sp, acts)
            world.control_step(A['UpClose'])
    px = np.asarray(sp.pos)[0][bmap]
    po = world.positions()
    main = [i for i in range(len(bmap)) if bmap[i] not in (3, 4)]
    np.testing.assert_allclose(px[main], po[main], atol=2e-2)


def test_oracle_hexagon_pushed(step):
    """Hexagon (6 verts — OUTSIDE the Pallas kernel's NVK=5 domain, so
    it must flow through the XLA path) hit by a moving circle: keeps the
    6/8-vertex narrowphase code honest even though no registered env
    instantiates those shapes (entities.py:568-574)."""
    st = S.place_robot(S.make_initial_state(2, 1), (-0.75, -0.75), 0.0)
    st = S.place_block(st, 0, (-0.25, 0.3), 0.0, int(C.ShapeType.CIRCLE), 0)
    st = S.place_block(st, 1, (0.1, 0.3), 0.15,
                       int(C.ShapeType.HEXAGON), 1)
    st = st.replace(vel=st.vel.at[BLOCK0].set(
        jnp.asarray([1.5, 0.0], jnp.float32)))
    _oracle_compare(st, [IDLE] * 3, tol_pos=1.5e-2, tol_ang=6e-2)


def test_oracle_octagon_against_wall(step):
    """Octagon (8 verts, XLA-path-only) thrown into a wall."""
    st = S.place_robot(S.make_initial_state(1, 1), (-0.75, -0.75), 0.0)
    st = S.place_block(st, 0, (0.0, 0.8), 0.1, int(C.ShapeType.OCTAGON), 0)
    st = st.replace(vel=st.vel.at[BLOCK0].set(
        jnp.asarray([0.0, 1.0], jnp.float32)))
    _oracle_compare(st, [IDLE] * 4, tol_pos=1.5e-2, tol_ang=6e-2)
