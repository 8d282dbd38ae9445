"""Batched rigid-body physics with Chipmunk-2D semantics.

The reference steps one pymunk ``Space`` per env in Python
(base_env.py:236-243: 10 substeps of dt=1/80 s, 10 solver iterations,
collision_slop 0.01).  This module re-implements the same sequential-
impulse scheme as pure JAX over the SoA :class:`EnvState`, designed for
``vmap`` over thousands of envs:

  * narrowphase over a *static* candidate-pair list (body counts are tiny,
    so all-pairs with masking beats any broadphase);
  * the impulse solver runs a fixed schedule of *solve groups*.  Groups
    are ordered like Chipmunk's arbiter-then-constraint sweep; within a
    group, contacts touch disjoint bodies wherever possible (block-block
    pairs use a round-robin tournament colouring so each colour is an
    exact Gauss-Seidel sweep) and otherwise apply accumulated-impulse
    Jacobi updates;
  * positions integrate at the start of each substep from the previous
    velocities plus Chipmunk-style pseudo-velocities (v_bias/w_bias),
    matching cpSpaceStep's update order.

Joint semantics implemented here (all used by the reference):
  PivotJoint velocity servo        entities.py:255-258, 703-707
  GearJoint heading servo/damper   entities.py:259-263, 708-711
  PinJoint finger attachment       entities.py:334-341
  RotaryLimitJoint finger limits   entities.py:343-346
  SimpleMotor finger drive         entities.py:349-354
  DampedRotarySpring googly eyes   entities.py:266-277
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu import geometry as G
from magical_tpu.core import collision as col
from magical_tpu.core.state import EnvState, N_ROBOT_BODIES, inv_mass_arrays

KSUB = G.KSUB
NV = G.NV

# Contact bias fraction per substep (Chipmunk: 1 - collisionBias**dt).
CONTACT_BIAS_COEF = C.bias_coef(C.COLLISION_BIAS, C.DT)


def _cross(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _perp(v):
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


# ---------------------------------------------------------------------------
# Static slot / pair tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def slot_tables(max_blocks: int):
    """Static per-collision-slot metadata.

    Slots: 0 robot body circle; 1-2 finger L sub-boxes; 3-4 finger R
    sub-boxes; then KSUB slots per block."""
    ns = 5 + max_blocks * KSUB
    body = np.zeros(ns, np.int32)
    friction = np.zeros(ns, np.float32)
    is_robot = np.zeros(ns, bool)
    body[0] = 0
    friction[0] = C.ROBOT_BODY_FRICTION
    is_robot[0] = True
    for side in range(2):           # 0 = left (body 1), 1 = right (body 2)
        for k in range(2):
            s = 1 + side * 2 + k
            body[s] = 1 + side
            friction[s] = C.FINGER_FRICTION
            is_robot[s] = True
    for b in range(max_blocks):
        for k in range(KSUB):
            s = 5 + b * KSUB + k
            body[s] = N_ROBOT_BODIES + b
            friction[s] = C.SHAPE_FRICTION
    return body, friction, is_robot


@functools.lru_cache(maxsize=None)
def pair_groups(max_blocks: int):
    """Static contact pair groups: a list of (name, slot_a (K,), slot_b (K,))
    numpy index arrays.  Grouping:
      * one group per block for robot-vs-block contacts (sequential over
        blocks => Gauss-Seidel through the shared robot bodies);
      * block-block pairs coloured with the round-robin tournament
        schedule so that no colour repeats a block."""
    groups = []
    for b in range(max_blocks):
        sa, sb = [], []
        for s in range(5):
            for k in range(KSUB):
                sa.append(s)
                sb.append(5 + b * KSUB + k)
        groups.append((f'robot_block{b}', np.array(sa, np.int32),
                       np.array(sb, np.int32)))

    # round-robin tournament colouring of the complete graph on blocks
    n = max_blocks + (max_blocks % 2)
    if max_blocks >= 2:
        ids = list(range(n))
        for rnd in range(n - 1):
            sa, sb = [], []
            # circle method: fix ids[0], rotate the rest
            arrangement = [ids[0]] + ids[1:][rnd:] + ids[1:][:rnd]
            for i in range(n // 2):
                b1 = arrangement[i]
                b2 = arrangement[n - 1 - i]
                if b1 >= max_blocks or b2 >= max_blocks:
                    continue
                for k1 in range(KSUB):
                    for k2 in range(KSUB):
                        sa.append(5 + b1 * KSUB + k1)
                        sb.append(5 + b2 * KSUB + k2)
            if sa:
                groups.append((f'bb_colour{rnd}', np.array(sa, np.int32),
                               np.array(sb, np.int32)))
    return groups


# ---------------------------------------------------------------------------
# Per-env slot geometry
# ---------------------------------------------------------------------------

def slot_geometry(state: EnvState):
    """Dynamic per-slot geometry: local verts (NS,NV,2), nv, radius, active."""
    mb = state.max_blocks
    rg = G.ROBOT_GEOM
    # robot slots (constants)
    rverts = np.zeros((5, NV, 2), np.float32)
    rverts[0, :] = 0.0                                  # circle centre
    for side in range(2):
        for k in range(2):
            poly = rg['finger_polys'][side, k]          # (4, 2)
            padded = np.concatenate([poly, np.repeat(poly[-1:], NV - 4, 0)])
            rverts[1 + side * 2 + k] = padded
    rnv = np.array([1, 4, 4, 4, 4], np.int32)
    rrad = np.array([C.ROBOT_RAD, 0, 0, 0, 0], np.float32)
    ract = np.ones(5, bool)

    if mb == 0:
        return (jnp.asarray(rverts), jnp.asarray(rnv), jnp.asarray(rrad),
                jnp.asarray(ract))

    # block slots: gather from the static type tables
    bs = state.block_shape                               # (MB,)
    bverts = jnp.asarray(G.BLOCK_VERTS)[bs]              # (MB,KSUB,NV,2)
    bnv = jnp.asarray(G.BLOCK_SUB_NV)[bs]                # (MB,KSUB)
    brad = jnp.asarray(G.BLOCK_SUB_RADIUS)[bs]
    bact = jnp.asarray(G.BLOCK_SUB_ACTIVE)[bs] & state.block_active[:, None]

    verts = jnp.concatenate(
        [jnp.asarray(rverts), bverts.reshape(mb * KSUB, NV, 2)])
    nv = jnp.concatenate([jnp.asarray(rnv), bnv.reshape(-1)])
    radius = jnp.concatenate([jnp.asarray(rrad), brad.reshape(-1)])
    active = jnp.concatenate([jnp.asarray(ract), bact.reshape(-1)])
    return verts, nv, radius, active


# ---------------------------------------------------------------------------
# Contact group container
# ---------------------------------------------------------------------------

def _one_hot(idx, n):
    """Constant (K, n) one-hot scatter/gather matrix for static indices.

    TPU XLA lowers vector-index scatter-adds to serialised loops; with
    static contact->body maps we instead gather and accumulate through
    these constant one-hot matmuls, which compile to dense (MXU/VPU)
    contractions — the difference is ~100x in solver throughput."""
    m = np.zeros((len(idx), n), np.float32)
    m[np.arange(len(idx)), np.asarray(idx)] = 1.0
    return jnp.asarray(m)


def _gat1(S, x):
    """Gather scalars per contact: (K,N) x (...,N) -> (...,K)."""
    return jnp.einsum('kn,...n->...k', S, x)


def _gat2(S, x):
    """Gather 2-vectors per contact: (K,N) x (...,N,2) -> (...,K,2)."""
    return jnp.einsum('kn,...nd->...kd', S, x)


def _sca1(S, x):
    """Accumulate scalars to bodies: (K,N) x (...,K) -> (...,N)."""
    return jnp.einsum('kn,...k->...n', S, x)


def _sca2(S, x):
    """Accumulate 2-vectors to bodies: (K,N) x (...,K,2) -> (...,N,2)."""
    return jnp.einsum('kn,...kd->...nd', S, x)


def _prestep_contacts(points, normals, dists, valids, body_a, body_b,
                      friction, pos, inv_m, inv_i):
    """Compute per-contact solver coefficients (cpContactBufferGetArray /
    cpArbiterPreStep semantics)."""
    nbp = pos.shape[-2]
    Sa = _one_hot(body_a, nbp)
    Sb = _one_hot(body_b, nbp)
    pa = _gat2(Sa, pos)
    pb = _gat2(Sb, pos)
    r1 = points - pa
    r2 = points - pb
    n = normals
    invm_a = _gat1(Sa, inv_m)
    invm_b = _gat1(Sb, inv_m)
    invi_a = _gat1(Sa, inv_i)
    invi_b = _gat1(Sb, inv_i)

    def k_scalar(rr1, rr2, axis):
        rcn1 = _cross(rr1, axis)
        rcn2 = _cross(rr2, axis)
        return (invm_a + invm_b + invi_a * rcn1 ** 2 + invi_b * rcn2 ** 2)

    n_mass = 1.0 / jnp.maximum(k_scalar(r1, r2, n), 1e-12)
    t_mass = 1.0 / jnp.maximum(k_scalar(r1, r2, _perp(n)), 1e-12)
    bias = -CONTACT_BIAS_COEF * jnp.minimum(
        0.0, dists + C.COLLISION_SLOP) / C.DT
    return dict(r1=r1, r2=r2, n=n, n_mass=n_mass, t_mass=t_mass, bias=bias,
                valid=valids, u=friction, Sa=Sa, Sb=Sb,
                invm_a=invm_a, invm_b=invm_b, invi_a=invi_a, invi_b=invi_b)


def _solve_contact_group(bodies, con, acc):
    """One accumulated-impulse solve sweep over a contact group.

    `bodies` = (v, w, vb, wb) padded with a trailing static row;
    `acc` = (jn, jt, jbias) accumulators.  All body gathers/accumulations
    go through the constant one-hot matrices Sa/Sb (see _one_hot)."""
    v, w, vb, wb = bodies
    jn_acc, jt_acc, jb_acc = acc
    Sa, Sb = con['Sa'], con['Sb']
    r1, r2, n = con['r1'], con['r2'], con['n']
    valid = con['valid']
    invm_a, invm_b = con['invm_a'], con['invm_b']
    invi_a, invi_b = con['invi_a'], con['invi_b']

    # --- pseudo-velocity (position correction) impulse --------------------
    vb1 = _gat2(Sa, vb) + _perp(r1) * _gat1(Sa, wb)[..., None]
    vb2 = _gat2(Sb, vb) + _perp(r2) * _gat1(Sb, wb)[..., None]
    vbn = jnp.sum((vb2 - vb1) * n, -1)
    jbn = (con['bias'] - vbn) * con['n_mass']
    jb_new = jnp.where(valid, jnp.maximum(jb_acc + jbn, 0.0), jb_acc)
    db = (jb_new - jb_acc)[..., None] * n

    # --- normal + friction impulse ---------------------------------------
    vr1 = _gat2(Sa, v) + _perp(r1) * _gat1(Sa, w)[..., None]
    vr2 = _gat2(Sb, v) + _perp(r2) * _gat1(Sb, w)[..., None]
    vr = vr2 - vr1
    vrn = jnp.sum(vr * n, -1)
    jn = -vrn * con['n_mass']            # bounce = 0 (elasticity 0)
    jn_new = jnp.where(valid, jnp.maximum(jn_acc + jn, 0.0), jn_acc)
    jt_max = con['u'] * jn_new
    vrt = jnp.sum(vr * _perp(n), -1)
    jt = -vrt * con['t_mass']
    jt_new = jnp.where(valid, jnp.clip(jt_acc + jt, -jt_max, jt_max), jt_acc)

    dj = (jn_new - jn_acc)[..., None] * n \
        + (jt_new - jt_acc)[..., None] * _perp(n)

    v = v + _sca2(Sa, -dj * invm_a[..., None]) \
        + _sca2(Sb, dj * invm_b[..., None])
    w = w + _sca1(Sa, -invi_a * _cross(r1, dj)) \
        + _sca1(Sb, invi_b * _cross(r2, dj))
    vb = vb + _sca2(Sa, -db * invm_a[..., None]) \
        + _sca2(Sb, db * invm_b[..., None])
    wb = wb + _sca1(Sa, -invi_a * _cross(r1, db)) \
        + _sca1(Sb, invi_b * _cross(r2, db))
    return (v, w, vb, wb), (jn_new, jt_new, jb_new)


# ---------------------------------------------------------------------------
# Joints
# ---------------------------------------------------------------------------

def _apply_ang(w, i, dj, inv_i):
    return w.at[i].add(dj * inv_i[i])


def _joint_sweep(bodies, jacc, pre, inv_m, inv_i, max_blocks):
    """One Gauss-Seidel sweep over all joints, in canonical order.

    `pre` holds per-substep prestep data; `jacc` the accumulators."""
    v, w, vb, wb = bodies
    dt = C.DT

    # 1. Robot pivot velocity servo (control body -> main body):
    #    drives v[0] toward the kinematic control velocity, force-limited,
    #    no bias (entities.py:255-258).
    j_max = pre['pivot_jmax']
    vr = v[0] - pre['control_vel']
    j = -vr / inv_m[0]
    acc_old = jacc['pivot']
    acc_new = acc_old + j
    norm = jnp.linalg.norm(acc_new)
    scale = jnp.where(norm > j_max, j_max / jnp.maximum(norm, 1e-12), 1.0)
    acc_new = acc_new * scale
    v = v.at[0].add((acc_new - acc_old) * inv_m[0])
    jacc = {**jacc, 'pivot': acc_new}

    # 2. Robot gear heading servo (entities.py:259-263): drives w[0] toward
    #    bias (clamped turn rate), torque-limited.
    wr = w[0]
    j = (pre['gear_bias'] - wr) / inv_i[0]
    acc_old = jacc['gear']
    acc_new = jnp.clip(acc_old + j, -pre['gear_jmax'], pre['gear_jmax'])
    w = w.at[0].add((acc_new - acc_old) * inv_i[0])
    jacc = {**jacc, 'gear': acc_new}

    # 3. Fingers: pin joint, rotary limit, simple motor per side.
    for side in range(2):
        fb = 1 + side
        # --- pin joint (entities.py:334-341, error_bias = 0) ---
        n = pre['pin_n'][side]
        r1 = pre['pin_r1'][side]
        n_mass = pre['pin_nmass'][side]
        bias = pre['pin_bias'][side]
        vr1 = v[0] + _perp(r1) * w[0]
        vr2 = v[fb]
        vrn = jnp.sum((vr2 - vr1) * n)
        j = (bias - vrn) * n_mass
        acc_old = jacc['pin'][side]
        acc_new = acc_old + j
        dj = (acc_new - acc_old) * n
        v = v.at[0].add(-dj * inv_m[0])
        w = w.at[0].add(-inv_i[0] * _cross(r1, dj))
        v = v.at[fb].add(dj * inv_m[fb])
        jacc = {**jacc, 'pin': jacc['pin'].at[side].set(acc_new)}

        # --- rotary limit (entities.py:343-346, error_bias = 0) ---
        bias = pre['limit_bias'][side]
        i_sum = 1.0 / (inv_i[0] + inv_i[fb])
        wr = w[fb] - w[0]
        j = -(bias + wr) * i_sum
        acc_old = jacc['limit'][side]
        acc_new = jnp.where(
            bias < 0.0,
            jnp.clip(acc_old + j, 0.0, jnp.inf),
            jnp.clip(acc_old + j, -jnp.inf, 0.0))
        acc_new = jnp.where(bias == 0.0, 0.0, acc_new)
        dj = jnp.where(bias == 0.0, 0.0, acc_new - acc_old)
        w = w.at[0].add(-dj * inv_i[0])
        w = w.at[fb].add(dj * inv_i[fb])
        jacc = {**jacc, 'limit': jacc['limit'].at[side].set(acc_new)}

        # --- simple motor (entities.py:349-354) ---
        rate = pre['motor_rate'][side]
        j_max = pre['motor_jmax']
        wr = w[fb] - w[0] + rate
        j = -wr * i_sum
        acc_old = jacc['motor'][side]
        acc_new = jnp.clip(acc_old + j, -j_max, j_max)
        dj = acc_new - acc_old
        w = w.at[0].add(-dj * inv_i[0])
        w = w.at[fb].add(dj * inv_i[fb])
        jacc = {**jacc, 'motor': jacc['motor'].at[side].set(acc_new)}

    # 4. Eye damped rotary springs (entities.py:266-277): damping part of
    #    cpDampedRotarySpring (spring torque applied in prestep).
    for side in range(2):
        eb = 3 + side
        i_sum = 1.0 / (inv_i[0] + inv_i[eb])
        w_coef = pre['eye_wcoef']
        wrn = w[0] - w[eb]
        target = jacc['eye_target'][side]
        w_damp = (target - wrn) * w_coef
        new_target = wrn + w_damp
        j_damp = w_damp * i_sum
        w = w.at[0].add(j_damp * inv_i[0])
        w = w.at[eb].add(-j_damp * inv_i[eb])
        jacc = {**jacc,
                'eye_target': jacc['eye_target'].at[side].set(new_target)}

    # 5. Block top-down friction dampers (entities.py:703-711): pivot to
    #    static (v -> 0, |J| <= F dt) + gear to static (w -> 0).
    if max_blocks == 0:
        return (v, w, vb, wb), jacc
    bsl = slice(N_ROBOT_BODIES, N_ROBOT_BODIES + max_blocks)
    vblk = v[bsl]
    wblk = w[bsl]
    inv_m_b = inv_m[bsl]
    inv_i_b = inv_i[bsl]
    safe_m = jnp.where(inv_m_b > 0, inv_m_b, 1.0)
    j = -vblk / safe_m[:, None]
    acc_old = jacc['block_pivot']
    acc_new = acc_old + jnp.where(inv_m_b[:, None] > 0, j, 0.0)
    norm = jnp.linalg.norm(acc_new, axis=-1)
    j_max = pre['block_pivot_jmax']
    scale = jnp.where(norm > j_max, j_max / jnp.maximum(norm, 1e-12), 1.0)
    acc_new = acc_new * scale[:, None]
    v = v.at[bsl].add((acc_new - acc_old) * inv_m_b[:, None])
    jacc = {**jacc, 'block_pivot': acc_new}

    safe_i = jnp.where(inv_i_b > 0, inv_i_b, 1.0)
    j = jnp.where(inv_i_b > 0, -wblk / safe_i, 0.0)
    acc_old = jacc['block_gear']
    acc_new = jnp.clip(acc_old + j, -pre['block_gear_jmax'],
                       pre['block_gear_jmax'])
    w = w.at[bsl].add((acc_new - acc_old) * inv_i_b)
    jacc = {**jacc, 'block_gear': acc_new}

    return (v, w, vb, wb), jacc


# ---------------------------------------------------------------------------
# The substep
# ---------------------------------------------------------------------------

def physics_substep(state: EnvState, iterations: int = C.PHYS_ITER):
    """One 1/80 s physics substep (cpSpaceStep + Robot.update semantics)."""
    mb = state.max_blocks
    nb = state.n_bodies
    dt = C.DT
    inv_m, inv_i = inv_mass_arrays(state)
    # pad a static body row (index nb) for wall contacts
    inv_m_p = jnp.concatenate([inv_m, jnp.zeros((1,), jnp.float32)])
    inv_i_p = jnp.concatenate([inv_i, jnp.zeros((1,), jnp.float32)])

    # ---- Robot.update (entities.py:459-479), BEFORE integration ----------
    a0 = state.angle[0]
    control_angle = a0 + state.rel_turn_angle
    control_vel = state.target_speed * jnp.stack([-jnp.sin(a0), jnp.cos(a0)])
    sides = jnp.array([-1.0, 1.0], jnp.float32)
    rel_ang = state.angle[1:3] - a0
    ang_err = rel_ang + sides * state.target_finger_angle
    motor_rate = jnp.clip(ang_err * 10.0, -1.0, 1.0)
    motor_rate = jnp.where(jnp.abs(motor_rate) < 1e-4, 0.0, motor_rate)

    # ---- integrate positions (cpBodyUpdatePosition) -----------------------
    pos = state.pos + (state.vel + state.v_bias) * dt
    angle = state.angle + (state.omega + state.w_bias) * dt
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 2), jnp.float32)])

    # ---- narrowphase ------------------------------------------------------
    verts_local, nv, radius, active = slot_geometry(state)
    slot_body, slot_friction, _ = slot_tables(mb)
    wverts = col.transform_verts(verts_local, pos[slot_body],
                                 angle[slot_body])

    groups = []

    # wall contacts: one group per wall (disjoint push directions)
    for wi in range(col.N_WALLS):
        wn = jnp.asarray(col.WALL_NORMALS[wi])
        wo = jnp.asarray(col.WALL_OFFSETS[wi])
        pts, nrm, dst, vld = jax.vmap(
            col.wall_contacts_for_slot, in_axes=(0, 0, 0, None, None))(
                wverts, nv, radius, wn, wo)
        ns = wverts.shape[0]
        k = ns * 2
        body_b = np.repeat(np.asarray(slot_body), 2)
        body_a = np.full(k, nb, np.int32)          # static row
        fr = np.repeat(np.asarray(slot_friction) * C.WALL_FRICTION, 2)
        vld = vld & active[:, None]
        con = _prestep_contacts(
            pts.reshape(k, 2), jnp.broadcast_to(nrm[:, None, :],
                                                (ns, 2, 2)).reshape(k, 2),
            dst.reshape(k), vld.reshape(k),
            jnp.asarray(body_a), jnp.asarray(body_b), jnp.asarray(fr),
            pos_p, inv_m_p, inv_i_p)
        groups.append(con)

    # shape-shape pair groups
    for name, sa, sb in pair_groups(mb):
        pts, nrm, dst, vld = jax.vmap(col.pair_contacts)(
            wverts[sa], nv[sa], radius[sa], wverts[sb], nv[sb], radius[sb],
            pos[slot_body[sa]], pos[slot_body[sb]])
        k = len(sa) * 2
        pair_ok = active[sa] & active[sb]
        vld = vld & pair_ok[:, None]
        body_a = np.repeat(slot_body[sa], 2)
        body_b = np.repeat(slot_body[sb], 2)
        fr = np.repeat(slot_friction[sa] * slot_friction[sb], 2)
        con = _prestep_contacts(
            pts.reshape(k, 2), nrm.reshape(k, 2), dst.reshape(k),
            vld.reshape(k), jnp.asarray(body_a), jnp.asarray(body_b),
            jnp.asarray(fr), pos_p, inv_m_p, inv_i_p)
        groups.append(con)

    for con in groups:
        con['inv_m'] = inv_m_p
        con['inv_i'] = inv_i_p

    # ---- joint prestep ----------------------------------------------------
    phys = state.phys
    rg = G.ROBOT_GEOM
    # gear bias (cpGearJoint with error_bias=0, max_bias=2.5):
    gear_err = angle[0] - control_angle
    gear_bias = jnp.clip(-gear_err / dt, -C.ROBOT_GEAR_MAX_BIAS,
                         C.ROBOT_GEAR_MAX_BIAS)
    # finger pin joints: world anchors
    Rm = col.rot2(angle[0])
    rel = jnp.asarray(rg['finger_rel_pos'])                  # (2,2)
    anchor_a = pos[0] + jnp.einsum('ij,sj->si', Rm, rel)      # (2,2)
    delta = pos[1:3] - anchor_a
    dist = jnp.linalg.norm(delta, axis=-1)
    pin_n = jnp.where(dist[:, None] > 1e-9, delta / jnp.maximum(
        dist[:, None], 1e-9), jnp.zeros_like(delta))
    pin_r1 = anchor_a - pos[0]
    rcn = _cross(pin_r1, pin_n)
    pin_k = inv_m_p[0] + inv_m_p[1:3] + inv_i_p[0] * rcn ** 2
    pin_nmass = 1.0 / jnp.maximum(pin_k, 1e-12)
    pin_bias = -dist / dt        # error_bias = 0 (entities.py:340)

    # rotary limits (error_bias = 0):
    lims = jnp.asarray(rg['finger_rot_limits'])               # (2,2) lo, hi
    ldist = angle[1:3] - angle[0]
    pdist = jnp.where(ldist > lims[:, 1], lims[:, 1] - ldist,
                      jnp.where(ldist < lims[:, 0], lims[:, 0] - ldist, 0.0))
    limit_bias = -pdist / dt

    # eye springs: apply spring torque impulse now (cpDampedRotarySpring
    # preStep), damping handled per-iteration.
    v = state.vel
    w = state.omega
    for side in range(2):
        eb = 3 + side
        rel_angle = angle[0] - angle[eb]
        j_spring = rel_angle * C.EYE_SPRING_STIFFNESS * dt
        w = w.at[0].add(-j_spring * inv_i[0])
        w = w.at[eb].add(j_spring * inv_i[eb])
    eye_isum_inv = inv_i_p[0] + inv_i_p[3]
    eye_wcoef = 1.0 - jnp.exp(-C.EYE_SPRING_DAMPING * dt * eye_isum_inv)

    pre = dict(
        control_vel=control_vel,
        pivot_jmax=phys[C.PV_ROBOT_POS_FORCE] * dt,
        gear_bias=gear_bias,
        gear_jmax=phys[C.PV_ROBOT_ROT_FORCE] * dt,
        pin_n=pin_n, pin_r1=pin_r1, pin_nmass=pin_nmass, pin_bias=pin_bias,
        limit_bias=limit_bias,
        motor_rate=motor_rate,
        motor_jmax=phys[C.PV_FINGER_FORCE] * dt,
        eye_wcoef=eye_wcoef,
        block_pivot_jmax=phys[C.PV_SHAPE_TRANS_FORCE] * dt,
        block_gear_jmax=phys[C.PV_SHAPE_ROT_FORCE] * dt,
    )

    # ---- solver iterations ------------------------------------------------
    v_p = jnp.concatenate([v, jnp.zeros((1, 2), jnp.float32)])
    w_p = jnp.concatenate([w, jnp.zeros((1,), jnp.float32)])
    vb_p = jnp.zeros_like(v_p)
    wb_p = jnp.zeros_like(w_p)

    accs = tuple(
        (jnp.zeros_like(con['bias']), jnp.zeros_like(con['bias']),
         jnp.zeros_like(con['bias'])) for con in groups)
    jacc0 = dict(
        pivot=jnp.zeros((2,), jnp.float32),
        gear=jnp.float32(0.0),
        pin=jnp.zeros((2,), jnp.float32),
        limit=jnp.zeros((2,), jnp.float32),
        motor=jnp.zeros((2,), jnp.float32),
        eye_target=jnp.zeros((2,), jnp.float32),
    )
    if mb > 0:
        jacc0['block_pivot'] = jnp.zeros((mb, 2), jnp.float32)
        jacc0['block_gear'] = jnp.zeros((mb,), jnp.float32)

    def iteration(_, carry):
        bodies, accs, jacc = carry
        new_accs = []
        for con, acc in zip(groups, accs):
            bodies, acc = _solve_contact_group(bodies, con, acc)
            new_accs.append(acc)
        bodies, jacc = _joint_sweep(bodies, jacc, pre, inv_m_p, inv_i_p, mb)
        return bodies, tuple(new_accs), jacc

    bodies, _, _ = jax.lax.fori_loop(
        0, iterations, iteration, ((v_p, w_p, vb_p, wb_p), accs, jacc0))
    v_p, w_p, vb_p, wb_p = bodies

    return state.replace(
        pos=pos, angle=angle,
        vel=v_p[:nb], omega=w_p[:nb],
        v_bias=vb_p[:nb], w_bias=wb_p[:nb])


def control_step(state: EnvState, action: jnp.ndarray,
                 phys_steps: int = C.PHYS_STEPS) -> EnvState:
    """One control step: apply the action (Robot.set_action,
    entities.py:439-457) and run `phys_steps` physics substeps
    (BaseEnv._phys_steps_on_frame, base_env.py:236-243)."""
    action = jnp.asarray(action, jnp.int32)
    state = state.replace(
        target_speed=jnp.asarray(C.ACTION_TARGET_SPEED)[action],
        rel_turn_angle=jnp.asarray(C.ACTION_TURN_ANGLE)[action],
        target_finger_angle=jnp.asarray(C.ACTION_FINGER_ANGLE)[action],
    )

    def body(s, _):
        return physics_substep(s), None

    state, _ = jax.lax.scan(body, state, None, length=phys_steps)
    return state.replace(t=state.t + 1)
