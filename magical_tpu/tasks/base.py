"""Task framework: variant flags, placement stacks, shared reset helpers.

In the reference each task is a ``BaseEnv`` subclass whose ``on_reset``
builds a pymunk scene (e.g. match_regions.py:44-191); here a task is
*data*: a :class:`TaskDef` with static sizes plus pure functions
``reset(key, flags) -> EnvState`` and ``score(state) -> f32``, both
jittable and vmappable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu import geometry as G
from magical_tpu.core import collision as col
from magical_tpu.core.state import (EnvState, N_ROBOT_BODIES,
                                    make_initial_state, place_robot)
from magical_tpu.tasks import randomize as R

KSUB = G.KSUB
NV = G.NV


@dataclasses.dataclass(frozen=True)
class Flags:
    """Unified variant-randomisation flags.

    The reference spells these differently per task (rand_poses /
    rand_poses_minor / rand_layout_minor, …; benchmarks/__init__.py:406-962);
    the mapping is recorded in each task module's VARIANTS dict."""
    colour: bool = False
    shape: bool = False
    count: bool = False
    layout_minor: bool = False
    layout_full: bool = False
    dynamics: bool = False

    @property
    def any_layout(self):
        return self.layout_minor or self.layout_full


@dataclasses.dataclass(frozen=True)
class TaskDef:
    name: str
    max_blocks: int
    max_goals: int
    ep_len: int
    variants: Tuple[str, ...]
    variant_flags: Dict[str, Flags]
    reset_fn: Callable  # (key, flags) -> EnvState
    score_fn: Callable  # (state) -> f32
    # Per-block-slot DEFAULT shape codes + which slots can ever be active
    # under the default count.  For variants that randomise neither shape
    # nor count, every slot's shape is a compile-time constant — the
    # renderer specialises its display list on this (fewer, cheaper
    # prims).  None => no static information.
    default_shapes: Optional[Tuple[int, ...]] = None
    default_active: Optional[Tuple[bool, ...]] = None

    def flags_for(self, variant: str) -> Flags:
        return self.variant_flags[variant]

    def static_block_shapes(self, flags: Flags):
        """Static per-slot shape table for this variant, or None.

        Returns a tuple of length max_blocks whose entries are a shape
        code (slot always holds that shape when active) or None (slot is
        never active), usable for trace-time display-list specialisation
        — only when the variant randomises neither shape nor count."""
        if flags.shape or flags.count or self.default_shapes is None:
            return None
        act = self.default_active or (True,) * len(self.default_shapes)
        table = [int(s) if a else None
                 for s, a in zip(self.default_shapes, act)]
        # slots beyond the default count are never active (CountPlus is
        # excluded above)
        table += [None] * (self.max_blocks - len(table))
        return tuple(table)

    def reachable_shape_types(self, flags: Flags):
        """Every shape-type code an env with these flags can instantiate.

        Shape/count randomisation draws from RAND_SHAPE_TYPES (the
        reference's SHAPE_TYPES subset, entities.py:568-574); fixed
        slots contribute their default codes.  Used by BatchedEnv to
        check the Pallas kernel's vertex-bound domain (NVK)."""
        from magical_tpu import constants as C
        codes = set()
        if self.default_shapes is not None:
            act = self.default_active or (True,) * len(self.default_shapes)
            codes |= {int(s) for s, a in zip(self.default_shapes, act) if a}
        if flags.shape or flags.count:
            codes |= {int(s) for s in C.RAND_SHAPE_TYPES}
        return codes


# Standard variant->flag tables ---------------------------------------------

FULL_VARIANTS = ('Demo', 'TestJitter', 'TestColour', 'TestShape',
                 'TestLayout', 'TestCountPlus', 'TestDynamics', 'TestAll')

FULL_VARIANT_FLAGS = {
    'Demo': Flags(),
    'TestJitter': Flags(layout_minor=True),
    'TestColour': Flags(colour=True),
    'TestShape': Flags(shape=True),
    'TestLayout': Flags(layout_full=True),
    'TestCountPlus': Flags(colour=True, shape=True, count=True,
                           layout_full=True),
    'TestDynamics': Flags(dynamics=True),
    'TestAll': Flags(colour=True, shape=True, count=True, layout_full=True,
                     dynamics=True),
}


def sample_phys(key, flags: Flags):
    """PhysicsVariables.defaults() / .sample() (phys_vars.py:70-83,
    base_env.py:198-203)."""
    if not flags.dynamics:
        return jnp.asarray(C.PHYS_VAR_DEFAULTS)
    u = jax.random.uniform(key, (C.N_PHYS_VARS,))
    return jnp.asarray(C.PHYS_VAR_LO) + u * (
        jnp.asarray(C.PHYS_VAR_HI) - jnp.asarray(C.PHYS_VAR_LO))


def choice(key, values, shape=()):
    """rng.choice over a static tuple of integer codes."""
    idx = jax.random.randint(key, shape, 0, len(values))
    return jnp.asarray(np.asarray(values, np.int32))[idx]


# ---------------------------------------------------------------------------
# Placement stack: incrementally-placed entity world geometry
# ---------------------------------------------------------------------------

class Stack:
    """Mutable (during trace) collection of placed entity geometries used
    as obstacles for subsequent placements.  Mirrors the incremental
    collision re-enabling in pm_randomise_all_poses (geom.py:300-341)."""

    def __init__(self, n_entities: int):
        self.verts = jnp.zeros((n_entities, KSUB, NV, 2), jnp.float32)
        self.rad = jnp.zeros((n_entities, KSUB), jnp.float32)
        self.nv = jnp.ones((n_entities, KSUB), jnp.int32)
        self.act = jnp.zeros((n_entities, KSUB), bool)
        self.mask = jnp.zeros((n_entities,), bool)
        # running count of failed placements (reference: PlacementError,
        # geom.py:111-113); threaded into EnvState.place_fail by resets
        self.fails = jnp.int32(0)

    def put(self, idx, geom_local, pos, angle, present=True, ok=True):
        wv, rad, nv, act = R.transform_entity(geom_local, pos, angle)
        self.verts = self.verts.at[idx].set(wv)
        self.rad = self.rad.at[idx].set(rad)
        self.nv = self.nv.at[idx].set(nv)
        self.act = self.act.at[idx].set(act)
        self.mask = self.mask.at[idx].set(present)
        bad = jnp.logical_and(jnp.asarray(present, bool),
                              ~jnp.asarray(ok, bool))
        self.fails = self.fails + bad.astype(jnp.int32)

    def placed(self):
        return (self.verts, self.rad, self.nv, self.act)

    def mask_without(self, *hidden):
        m = self.mask
        for h in hidden:
            m = m.at[h].set(False)
        return m


def robot_geom():
    vr = R.robot_placement_geom()
    return tuple(jnp.asarray(x) for x in vr)


def jitter_limits(flags: Flags):
    """(pos_linf, rot) limits for minor-jitter placement."""
    if flags.layout_minor:
        return C.JITTER_POS_BOUND, C.JITTER_ROT_BOUND
    return None, None


def goal_center(xyhw):
    """Reference goal spec (x, y, h, w) with x,y = TOP-LEFT corner
    (entities.py:794-797) -> centre (cx, cy)."""
    x, y, h, w = xyhw
    return (x + w / 2.0, y - h / 2.0)


def com_in_goal(p, cxcyhw):
    """cpBB.contains_vect of the goal sensor box (entities.py:851-857)."""
    cx, cy, h, w = cxcyhw[..., 0], cxcyhw[..., 1], cxcyhw[..., 2], \
        cxcyhw[..., 3]
    return (jnp.abs(p[..., 0] - cx) <= w / 2.0) & \
        (jnp.abs(p[..., 1] - cy) <= h / 2.0)


def set_blocks(state: EnvState, shapes, colours, poses, angles, active):
    """Write block arrays + body poses for all block slots at once."""
    nb = N_ROBOT_BODIES
    mb = state.max_blocks
    poses = jnp.asarray(poses, jnp.float32)
    angles = jnp.asarray(angles, jnp.float32)
    active = jnp.asarray(active, bool)
    # park inactive blocks far away
    park = jnp.stack([50.0 + 4.0 * jnp.arange(mb, dtype=jnp.float32),
                      jnp.full((mb,), 50.0, jnp.float32)], -1)
    pos = jnp.where(active[:, None], poses, park)
    ang = jnp.where(active, angles, 0.0)
    return state.replace(
        pos=state.pos.at[nb:].set(pos),
        angle=state.angle.at[nb:].set(ang),
        block_shape=jnp.asarray(shapes, jnp.int32),
        block_colour=jnp.asarray(colours, jnp.int32),
        block_active=active,
    )


def set_goals(state: EnvState, cxcyhw, colours, active):
    return state.replace(
        goal_xyhw=jnp.asarray(cxcyhw, jnp.float32),
        goal_colour=jnp.asarray(colours, jnp.int32),
        goal_active=jnp.asarray(active, bool),
    )


def finalize_robot(state: EnvState, pos, angle):
    return place_robot(state, pos, angle)
