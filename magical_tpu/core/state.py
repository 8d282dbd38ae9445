"""Canonical structure-of-arrays environment state.

The reference keeps environment state inside a pymunk ``Space`` full of
C objects (base_env.py:177-243); the TPU-native engine instead represents
one environment as a small pytree of fixed-shape arrays so that thousands
of envs can be stepped in lockstep under ``jax.vmap``/``jit`` and sharded
with ``jax.sharding`` along the batch axis.

Body slot convention (per env, ``NB = 5 + max_blocks``):

  0            robot main body   (dynamic circle, entities.py:238-247)
  1, 2         finger bodies L/R (dynamic two-box polys, entities.py:279-331)
  3, 4         eye bodies L/R    (dynamic, no collision shapes,
                                  entities.py:265-277)
  5 .. 5+MB-1  pushable blocks   (entities.py:584-711)

The kinematic control body (entities.py:251-254) is *implicit*: it has
infinite mass, so the control joints only ever see its velocity/angle
targets, which we derive from the action each substep.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu import geometry as G

# fixed robot body count (main + 2 fingers + 2 eyes)
N_ROBOT_BODIES = 5
# parking position for inactive block bodies — far outside the arena so
# they can never generate contacts or affect scores.
PARK_POS = 50.0


def max_contacts(max_blocks: int) -> int:
    """Dense contact budget after compaction (generous: worst observed
    scenes stay under half of this)."""
    return 32 + 16 * max_blocks


def n_joint_acc(max_blocks: int) -> int:
    """Flattened joint-impulse accumulator length: robot pivot (2) + gear
    (1) + pin L/R (2) + rotary limit L/R (2) + finger motor L/R (2), then
    per block pivot (2 each) + gear (1 each).  Persisted across substeps
    and control steps like Chipmunk's cpConstraint jAcc warm start."""
    return 9 + 3 * max_blocks


@flax.struct.dataclass
class EnvState:
    """State of a single environment (batched via vmap)."""
    # --- rigid body state -------------------------------------------------
    pos: jnp.ndarray         # (NB, 2) f32
    angle: jnp.ndarray       # (NB,)  f32
    vel: jnp.ndarray         # (NB, 2) f32
    omega: jnp.ndarray       # (NB,)  f32
    # Chipmunk-style pseudo velocities: accumulated by the contact solver,
    # applied to positions at the next substep, then cleared
    # (cpBodyUpdatePosition semantics).
    v_bias: jnp.ndarray      # (NB, 2) f32
    w_bias: jnp.ndarray      # (NB,)  f32

    # --- robot control targets (set once per control step) ---------------
    target_speed: jnp.ndarray         # () f32
    rel_turn_angle: jnp.ndarray       # () f32
    target_finger_angle: jnp.ndarray  # () f32

    # --- per-block semantic state ----------------------------------------
    block_shape: jnp.ndarray   # (MB,) i32 ShapeType codes
    block_colour: jnp.ndarray  # (MB,) i32 ShapeColour codes
    block_active: jnp.ndarray  # (MB,) bool

    # --- goal regions ------------------------------------------------------
    goal_xyhw: jnp.ndarray     # (MG, 4) f32 — x, y = TOP-LEFT corner
    goal_colour: jnp.ndarray   # (MG,) i32
    goal_active: jnp.ndarray   # (MG,) bool

    # --- warm-start caches (Chipmunk arbiter/constraint jAcc) -------------
    # Compacted contact slots carry their candidate id + accumulated
    # normal/friction impulses across substeps AND control steps, applied
    # at prestep like cpArbiterApplyCachedImpulse (bias impulses are not
    # cached, matching Chipmunk).
    con_id: jnp.ndarray        # (MAXC,) i32 candidate id, -1 = empty
    con_jn: jnp.ndarray        # (MAXC,) f32 accumulated normal impulse
    con_jt: jnp.ndarray        # (MAXC,) f32 accumulated friction impulse
    joint_acc: jnp.ndarray     # (n_joint_acc(MB),) f32

    # --- misc -------------------------------------------------------------
    aux: jnp.ndarray           # (4,) i32 task-specific extras
    # number of entities whose reset placement found no collision-free
    # pose (the reference raises PlacementError, geom.py:111-113; we
    # count and surface it via info['n_placement_failures'])
    place_fail: jnp.ndarray    # () i32
    phys: jnp.ndarray          # (5,) f32 PhysicsVariables vector
    rng: jnp.ndarray           # (2,) u32 jax PRNG key
    t: jnp.ndarray             # () i32 episode step counter

    @property
    def n_bodies(self):
        return self.pos.shape[-2]

    @property
    def max_blocks(self):
        return self.block_shape.shape[-1]

    @property
    def robot_pos(self):
        return self.pos[..., 0, :]

    @property
    def robot_angle(self):
        return self.angle[..., 0]

    @property
    def block_pos(self):
        return self.pos[..., N_ROBOT_BODIES:, :]

    @property
    def block_angle(self):
        return self.angle[..., N_ROBOT_BODIES:]


def inv_mass_arrays(state: EnvState):
    """Per-body inverse mass / inverse moment, (NB,) each.

    Block moments depend on the (dynamic) per-env shape type; inactive
    blocks get zero inverse mass so they behave as static parked bodies.
    """
    mb = state.max_blocks
    inv_m_robot = np.array([
        1.0 / C.ROBOT_MASS,
        1.0 / C.FINGER_MASS, 1.0 / C.FINGER_MASS,
        1.0 / C.EYE_MASS, 1.0 / C.EYE_MASS], dtype=np.float32)
    inv_i_robot = np.array([
        1.0 / G.ROBOT_GEOM['body_moment'],
        1.0 / G.ROBOT_GEOM['finger_moment'],
        1.0 / G.ROBOT_GEOM['finger_moment'],
        1.0 / G.ROBOT_GEOM['eye_moment'],
        1.0 / G.ROBOT_GEOM['eye_moment']], dtype=np.float32)
    act = state.block_active.astype(jnp.float32)
    inv_m_blocks = act / C.SHAPE_MASS
    block_moment = jnp.asarray(G.BLOCK_MOMENT)[state.block_shape]
    inv_i_blocks = act / block_moment
    inv_m = jnp.concatenate([jnp.asarray(inv_m_robot), inv_m_blocks])
    inv_i = jnp.concatenate([jnp.asarray(inv_i_robot), inv_i_blocks])
    return inv_m, inv_i


def make_initial_state(max_blocks: int, max_goals: int) -> EnvState:
    """An all-zeros/parked template state; tasks fill it in at reset."""
    nb = N_ROBOT_BODIES + max_blocks
    park = np.zeros((nb, 2), np.float32)
    for b in range(max_blocks):
        park[N_ROBOT_BODIES + b] = (PARK_POS + 4.0 * b, PARK_POS)
    return EnvState(
        pos=jnp.asarray(park),
        angle=jnp.zeros((nb,), jnp.float32),
        vel=jnp.zeros((nb, 2), jnp.float32),
        omega=jnp.zeros((nb,), jnp.float32),
        v_bias=jnp.zeros((nb, 2), jnp.float32),
        w_bias=jnp.zeros((nb,), jnp.float32),
        target_speed=jnp.float32(0.0),
        rel_turn_angle=jnp.float32(0.0),
        target_finger_angle=jnp.float32(0.0),
        block_shape=jnp.zeros((max_blocks,), jnp.int32),
        block_colour=jnp.zeros((max_blocks,), jnp.int32),
        block_active=jnp.zeros((max_blocks,), bool),
        goal_xyhw=jnp.zeros((max_goals, 4), jnp.float32),
        goal_colour=jnp.zeros((max_goals,), jnp.int32),
        goal_active=jnp.zeros((max_goals,), bool),
        con_id=jnp.full((max_contacts(max_blocks),), -1, jnp.int32),
        con_jn=jnp.zeros((max_contacts(max_blocks),), jnp.float32),
        con_jt=jnp.zeros((max_contacts(max_blocks),), jnp.float32),
        joint_acc=jnp.zeros((n_joint_acc(max_blocks),), jnp.float32),
        aux=jnp.zeros((4,), jnp.int32),
        place_fail=jnp.int32(0),
        phys=jnp.asarray(C.PHYS_VAR_DEFAULTS),
        rng=jnp.zeros((2,), jnp.uint32),
        t=jnp.int32(0),
    )


def place_robot(state: EnvState, pos, angle) -> EnvState:
    """Set the robot's 5 bodies to the canonical configuration for a given
    main-body pose (entities.py:238-331): fingers at their initial angular
    offsets and pinned positions, eyes aligned with the body."""
    pos = jnp.asarray(pos, jnp.float32)
    angle = jnp.asarray(angle, jnp.float32)
    ca, sa = jnp.cos(angle), jnp.sin(angle)

    def rot(v):
        return jnp.stack([ca * v[..., 0] - sa * v[..., 1],
                          sa * v[..., 0] + ca * v[..., 1]], axis=-1)

    new_pos = state.pos
    new_angle = state.angle
    new_pos = new_pos.at[0].set(pos)
    new_angle = new_angle.at[0].set(angle)
    rel = jnp.asarray(G.ROBOT_GEOM['finger_rel_pos'])        # (2, 2)
    deltas = jnp.asarray(G.ROBOT_GEOM['finger_init_delta'])  # (2,)
    for i in range(2):
        new_pos = new_pos.at[1 + i].set(pos + rot(rel[i]))
        new_angle = new_angle.at[1 + i].set(angle + deltas[i])
    for i in range(2):
        # eye bodies have no meaningful position (no collision shapes);
        # keep them at the robot centre (entities.py:265-277 never sets
        # their position).
        new_pos = new_pos.at[3 + i].set(pos)
        new_angle = new_angle.at[3 + i].set(angle)
    return state.replace(pos=new_pos, angle=new_angle)


def place_block(state: EnvState, idx: int, pos, angle, shape_type,
                colour) -> EnvState:
    """Activate block `idx` with the given pose/type/colour."""
    b = N_ROBOT_BODIES + idx
    return state.replace(
        pos=state.pos.at[b].set(jnp.asarray(pos, jnp.float32)),
        angle=state.angle.at[b].set(jnp.asarray(angle, jnp.float32)),
        block_shape=state.block_shape.at[idx].set(shape_type),
        block_colour=state.block_colour.at[idx].set(colour),
        block_active=state.block_active.at[idx].set(True),
    )
