"""Batched rigid-body physics with Chipmunk-2D semantics.

The reference steps one pymunk ``Space`` per env in Python
(base_env.py:236-243: 10 substeps of dt=1/80 s, 10 solver iterations,
collision_slop 0.01).  This module re-implements the same sequential-
impulse scheme as pure JAX over the SoA :class:`EnvState`, shaped for
the TPU compiler:

  * narrowphase evaluates ONE flat static candidate list (all wall/
    shape-pair contacts) per substep — body counts are tiny, so all-pairs
    with masking beats any broadphase;
  * active contacts are compacted to a fixed per-task budget (stable
    order) so the solver works on a small dense contact set;
  * the impulse solver runs Chipmunk's accumulated-impulse iteration
    with *mass-splitting Jacobi* sweeps over the contact set (each body's
    mass is split across its active contacts, which keeps simultaneous
    impulses convergent without data-dependent ordering), followed by a
    Gauss-Seidel sweep over the joints — all as a handful of large
    regular ops per iteration (batched matmuls against per-env one-hot
    incidence matrices; no scatters, which XLA:TPU serialises);
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
from magical_tpu.core.state import (EnvState, N_ROBOT_BODIES,
                                    inv_mass_arrays, max_contacts)

KSUB = G.KSUB
NV = G.NV

# Contact bias fraction per substep (Chipmunk: 1 - collisionBias**dt).
CONTACT_BIAS_COEF = C.bias_coef(C.COLLISION_BIAS, C.DT)


def _cross(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _perp(v):
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


# ---------------------------------------------------------------------------
# Static slot / candidate tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def slot_tables(max_blocks: int):
    """Static per-collision-slot metadata.

    Slots: 0 robot body circle; 1-2 finger L sub-boxes; 3-4 finger R
    sub-boxes; then KSUB slots per block."""
    ns = 5 + max_blocks * KSUB
    body = np.zeros(ns, np.int32)
    friction = np.zeros(ns, np.float32)
    body[0] = 0
    friction[0] = C.ROBOT_BODY_FRICTION
    for side in range(2):           # 0 = left (body 1), 1 = right (body 2)
        for k in range(2):
            s = 1 + side * 2 + k
            body[s] = 1 + side
            friction[s] = C.FINGER_FRICTION
    for b in range(max_blocks):
        for k in range(KSUB):
            s = 5 + b * KSUB + k
            body[s] = N_ROBOT_BODIES + b
            friction[s] = C.SHAPE_FRICTION
    return body, friction


@functools.lru_cache(maxsize=None)
def pair_table(max_blocks: int):
    """Static shape-pair candidate list (slot_a, slot_b): robot sub-shapes
    vs every block sub-shape, plus all block-block sub-shape pairs.  Same
    collision filtering as the reference: no robot-robot pairs (shared
    ShapeFilter group, entities.py:358-375), no intra-block pairs
    (entities.py:662-667)."""
    sa, sb = [], []
    for b in range(max_blocks):
        for s in range(5):
            for k in range(KSUB):
                sa.append(s)
                sb.append(5 + b * KSUB + k)
    for b1 in range(max_blocks):
        for b2 in range(b1 + 1, max_blocks):
            for k1 in range(KSUB):
                for k2 in range(KSUB):
                    sa.append(5 + b1 * KSUB + k1)
                    sb.append(5 + b2 * KSUB + k2)
    return np.asarray(sa, np.int32), np.asarray(sb, np.int32)


@functools.lru_cache(maxsize=None)
def candidate_bodies(max_blocks: int):
    """Static per-candidate (body_a, body_b, friction) in candidate order:
    [4 walls x NS slots x 2 pts] then [pairs x 2 pts]."""
    slot_body, slot_friction = slot_tables(max_blocks)
    nb = N_ROBOT_BODIES + max_blocks          # static row index = nb
    ns = len(slot_body)
    ba, bb, fr = [], [], []
    for _w in range(col.N_WALLS):
        for s in range(ns):
            for _p in range(2):
                ba.append(nb)
                bb.append(slot_body[s])
                fr.append(slot_friction[s] * C.WALL_FRICTION)
    sa, sb = pair_table(max_blocks)
    for i in range(len(sa)):
        for _p in range(2):
            ba.append(slot_body[sa[i]])
            bb.append(slot_body[sb[i]])
            fr.append(slot_friction[sa[i]] * slot_friction[sb[i]])
    return (np.asarray(ba, np.int32), np.asarray(bb, np.int32),
            np.asarray(fr, np.float32))


# ---------------------------------------------------------------------------
# Per-env slot geometry
# ---------------------------------------------------------------------------

def slot_geometry(state: EnvState):
    """Dynamic per-slot geometry: local verts (NS,NV,2), nv, radius,
    active."""
    mb = state.max_blocks
    rg = G.ROBOT_GEOM
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
# Contact compaction + solve
# ---------------------------------------------------------------------------

def _compact_contacts(pts, nrm, dst, vld, max_blocks):
    """Select up to MAXC valid contacts (stable candidate order).

    Implemented as a prefix-sum + one-hot contraction rather than
    argsort/gather/scatter — sorts and scatters are catastrophically slow
    on TPU; a (KC x MAXC) masked matmul is one MXU op per field."""
    ba, bb, fr = candidate_bodies(max_blocks)
    maxc = max_contacts(max_blocks)
    vf = vld.astype(jnp.float32)
    tgt = jnp.cumsum(vf, axis=-1) - 1.0            # slot index per valid
    slots = jnp.arange(maxc, dtype=jnp.float32)
    # S[k, m] = 1 iff candidate k is the m-th valid contact
    S = (jnp.abs(tgt[..., :, None] - slots) < 0.5) * vf[..., :, None]

    def take1(x):
        return jnp.einsum('...km,...k->...m', S, x)

    def take2(x):
        return jnp.einsum('...km,...kd->...md', S, x)

    valid_c = take1(vf) > 0.5
    kc = vld.shape[-1]
    cand_idx = jnp.round(
        take1(jnp.arange(kc, dtype=jnp.float32))).astype(jnp.int32)
    return dict(
        points=take2(pts), normals=take2(nrm), dists=take1(dst),
        valid=valid_c,
        cand_id=jnp.where(valid_c, cand_idx, -1),
        body_a=jnp.round(take1(jnp.asarray(ba, jnp.float32))).astype(
            jnp.int32),
        body_b=jnp.round(take1(jnp.asarray(bb, jnp.float32))).astype(
            jnp.int32),
        friction=take1(jnp.asarray(fr)))


def _contact_prestep(con, pos_p, inv_m_p, inv_i_p):
    """cpArbiterPreStep over the compacted contact set, with per-env
    incidence matrices and mass-splitting Jacobi stiffness."""
    nbp = pos_p.shape[-2]
    valid_f = con['valid'].astype(jnp.float32)
    A = jax.nn.one_hot(con['body_a'], nbp, dtype=jnp.float32) \
        * valid_f[..., None]
    B = jax.nn.one_hot(con['body_b'], nbp, dtype=jnp.float32) \
        * valid_f[..., None]
    # per-body active contact degree for mass splitting
    deg = jnp.maximum(jnp.sum(A + B, axis=-2), 1.0)        # (NBP,)
    invm_split = inv_m_p * deg
    invi_split = inv_i_p * deg

    def gat1(M, x):
        return jnp.einsum('...kn,...n->...k', M, x)

    def gat2(M, x):
        return jnp.einsum('...kn,...nd->...kd', M, x)

    pa = gat2(A, pos_p)
    pb = gat2(B, pos_p)
    r1 = con['points'] - pa
    r2 = con['points'] - pb
    n = con['normals']
    invm_a = gat1(A, invm_split)
    invm_b = gat1(B, invm_split)
    invi_a = gat1(A, invi_split)
    invi_b = gat1(B, invi_split)

    def k_scalar(axis):
        rcn1 = _cross(r1, axis)
        rcn2 = _cross(r2, axis)
        return invm_a + invm_b + invi_a * rcn1 ** 2 + invi_b * rcn2 ** 2

    n_mass = 1.0 / jnp.maximum(k_scalar(n), 1e-12)
    t_mass = 1.0 / jnp.maximum(k_scalar(_perp(n)), 1e-12)
    bias = -CONTACT_BIAS_COEF * jnp.minimum(
        0.0, con['dists'] + C.COLLISION_SLOP) / C.DT
    # impulses are applied with the TRUE inverse masses; splitting only
    # enters the effective per-contact stiffness above
    return dict(A=A, B=B, r1=r1, r2=r2, n=n, n_mass=n_mass, t_mass=t_mass,
                bias=bias, valid=con['valid'], u=con['friction'],
                invm_a=gat1(A, inv_m_p), invm_b=gat1(B, inv_m_p),
                invi_a=gat1(A, inv_i_p), invi_b=gat1(B, inv_i_p))


def _gat1(M, x):
    return jnp.einsum('...kn,...n->...k', M, x)


def _gat2(M, x):
    return jnp.einsum('...kn,...nd->...kd', M, x)


def _acc1(M, x):
    return jnp.einsum('...kn,...k->...n', M, x)


def _acc2(M, x):
    return jnp.einsum('...kn,...kd->...nd', M, x)


def _apply_contact_impulse(bodies, con, djn, djt):
    """Apply per-contact (normal, tangent) impulse deltas to the bodies
    with the true inverse masses (used for both warm-start cached
    impulses, cpArbiterApplyCachedImpulse, and iteration deltas)."""
    v, w, vb, wb = bodies
    A, B = con['A'], con['B']
    n = con['n']
    dj = djn[..., None] * n + djt[..., None] * _perp(n)
    v = v + _acc2(A, -dj * con['invm_a'][..., None]) \
        + _acc2(B, dj * con['invm_b'][..., None])
    w = w + _acc1(A, -con['invi_a'] * _cross(con['r1'], dj)) \
        + _acc1(B, con['invi_b'] * _cross(con['r2'], dj))
    return (v, w, vb, wb)


def _warm_start_contacts(con, state):
    """Gather cached impulses for contacts that persist across substeps
    (matched by candidate id, Chipmunk's contact-id hash equivalent)."""
    old_id = state.con_id
    match = (con['cand_id'][..., :, None] == old_id[..., None, :]) \
        & con['valid'][..., :, None] & (old_id >= 0)[..., None, :]
    Mf = match.astype(jnp.float32)
    jn_w = jnp.einsum('...mo,...o->...m', Mf, state.con_jn)
    jt_w = jnp.einsum('...mo,...o->...m', Mf, state.con_jt)
    return jn_w, jt_w


def _jacc_to_vec(jacc, mb):
    parts = [jacc['pivot'], jacc['gear'][None], jacc['pin'], jacc['limit'],
             jacc['motor']]
    if mb > 0:
        parts += [jacc['block_pivot'].reshape(-1), jacc['block_gear']]
    return jnp.concatenate(parts)


def _jacc_from_vec(vec, mb):
    jacc = dict(
        pivot=vec[0:2],
        gear=vec[2],
        pin=vec[3:5],
        limit=vec[5:7],
        motor=vec[7:9],
        eye_target=jnp.zeros((2,), jnp.float32),
    )
    if mb > 0:
        jacc['block_pivot'] = vec[9:9 + 2 * mb].reshape(mb, 2)
        jacc['block_gear'] = vec[9 + 2 * mb:9 + 3 * mb]
    return jacc


def _contact_iteration(bodies, con, acc):
    """One mass-splitting Jacobi sweep with Chipmunk's accumulated-impulse
    clamping (cpArbiterApplyImpulse semantics per contact)."""
    v, w, vb, wb = bodies
    jn_acc, jt_acc, jb_acc = acc
    A, B = con['A'], con['B']
    r1, r2, n = con['r1'], con['r2'], con['n']
    valid = con['valid']

    # pseudo-velocity (position correction) impulse
    vb1 = _gat2(A, vb) + _perp(r1) * _gat1(A, wb)[..., None]
    vb2 = _gat2(B, vb) + _perp(r2) * _gat1(B, wb)[..., None]
    vbn = jnp.sum((vb2 - vb1) * n, -1)
    jbn = (con['bias'] - vbn) * con['n_mass']
    jb_new = jnp.where(valid, jnp.maximum(jb_acc + jbn, 0.0), jb_acc)
    db = (jb_new - jb_acc)[..., None] * n

    # normal + friction impulse
    vr1 = _gat2(A, v) + _perp(r1) * _gat1(A, w)[..., None]
    vr2 = _gat2(B, v) + _perp(r2) * _gat1(B, w)[..., None]
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

    v = v + _acc2(A, -dj * con['invm_a'][..., None]) \
        + _acc2(B, dj * con['invm_b'][..., None])
    w = w + _acc1(A, -con['invi_a'] * _cross(r1, dj)) \
        + _acc1(B, con['invi_b'] * _cross(r2, dj))
    vb = vb + _acc2(A, -db * con['invm_a'][..., None]) \
        + _acc2(B, db * con['invm_b'][..., None])
    wb = wb + _acc1(A, -con['invi_a'] * _cross(r1, db)) \
        + _acc1(B, con['invi_b'] * _cross(r2, db))
    return (v, w, vb, wb), (jn_new, jt_new, jb_new)


# ---------------------------------------------------------------------------
# Joints
# ---------------------------------------------------------------------------

def _apply_joint_cached(bodies, jacc, pre, inv_m, inv_i, max_blocks):
    """Apply each constraint's cached accumulated impulse along the NEW
    prestep geometry (cpConstraint applyCachedImpulse, dt_coef = 1).
    Returns (bodies, jacc) — the rotary limit zeroes its accumulator when
    the joint is inside its limits (cpRotaryLimitJoint preStep)."""
    v, w, vb, wb = bodies

    v = v.at[0].add(jacc['pivot'] * inv_m[0])
    w = w.at[0].add(jacc['gear'] * inv_i[0])

    limit_acc = jnp.where(pre['limit_bias'] == 0.0, 0.0, jacc['limit'])
    for side in range(2):
        fb = 1 + side
        dj = jacc['pin'][side] * pre['pin_n'][side]
        v = v.at[0].add(-dj * inv_m[0])
        w = w.at[0].add(-inv_i[0] * _cross(pre['pin_r1'][side], dj))
        v = v.at[fb].add(dj * inv_m[fb])
        dw = limit_acc[side] + jacc['motor'][side]
        w = w.at[0].add(-dw * inv_i[0])
        w = w.at[fb].add(dw * inv_i[fb])
    jacc = {**jacc, 'limit': limit_acc}

    if max_blocks > 0:
        bsl = slice(N_ROBOT_BODIES, N_ROBOT_BODIES + max_blocks)
        v = v.at[bsl].add(jacc['block_pivot'] * inv_m[bsl, None])
        w = w.at[bsl].add(jacc['block_gear'] * inv_i[bsl])
    return (v, w, vb, wb), jacc


def _joint_sweep(bodies, jacc, pre, inv_m, inv_i, max_blocks):
    """One Gauss-Seidel sweep over all joints, in canonical order."""
    v, w, vb, wb = bodies

    # 1. Robot pivot velocity servo (control body -> main body)
    #    (entities.py:255-258): v[0] -> control velocity, force-limited.
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

    # 2. Robot gear heading servo (entities.py:259-263).
    wr = w[0]
    j = (pre['gear_bias'] - wr) / inv_i[0]
    acc_old = jacc['gear']
    acc_new = jnp.clip(acc_old + j, -pre['gear_jmax'], pre['gear_jmax'])
    w = w.at[0].add((acc_new - acc_old) * inv_i[0])
    jacc = {**jacc, 'gear': acc_new}

    # 3. Fingers: pin joint, rotary limit, simple motor per side.
    for side in range(2):
        fb = 1 + side
        # pin joint (entities.py:334-341, error_bias = 0)
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

        # rotary limit (entities.py:343-346, error_bias = 0)
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

        # simple motor (entities.py:349-354)
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

    # 4. Eye damped rotary springs (entities.py:266-277): damping part
    #    (spring torque applied in prestep).
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

    # 5. Block top-down friction dampers (entities.py:703-711).
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

    # ---- narrowphase over the flat candidate list -------------------------
    verts_local, nv, radius, active = slot_geometry(state)
    slot_body, _ = slot_tables(mb)
    wverts = col.transform_verts(verts_local, pos[slot_body],
                                 angle[slot_body])

    # walls: (4 walls, NS slots, 2 pts)
    wn = jnp.asarray(col.WALL_NORMALS)
    wo = jnp.asarray(col.WALL_OFFSETS)
    wpts, wnrm, wdst, wvld = jax.vmap(
        jax.vmap(col.wall_contacts_for_slot, in_axes=(0, 0, 0, None, None)),
        in_axes=(None, None, None, 0, 0))(wverts, nv, radius, wn, wo)
    wvld = wvld & active[None, :, None]
    wnrm = jnp.broadcast_to(wnrm[:, :, None, :], wpts.shape)

    parts_pts = [wpts.reshape(-1, 2)]
    parts_nrm = [wnrm.reshape(-1, 2)]
    parts_dst = [wdst.reshape(-1)]
    parts_vld = [wvld.reshape(-1)]

    sa, sb = pair_table(mb)
    if len(sa):
        ppts, pnrm, pdst, pvld = jax.vmap(col.pair_contacts)(
            wverts[sa], nv[sa], radius[sa], wverts[sb], nv[sb], radius[sb],
            pos[slot_body[sa]], pos[slot_body[sb]])
        pair_ok = active[sa] & active[sb]
        pvld = pvld & pair_ok[:, None]
        parts_pts.append(ppts.reshape(-1, 2))
        parts_nrm.append(pnrm.reshape(-1, 2))
        parts_dst.append(pdst.reshape(-1))
        parts_vld.append(pvld.reshape(-1))

    pts = jnp.concatenate(parts_pts)
    nrm = jnp.concatenate(parts_nrm)
    dst = jnp.concatenate(parts_dst)
    vld = jnp.concatenate(parts_vld)

    con_raw = _compact_contacts(pts, nrm, dst, vld, mb)
    con = _contact_prestep(con_raw, pos_p, inv_m_p, inv_i_p)

    # ---- joint prestep ----------------------------------------------------
    phys = state.phys
    rg = G.ROBOT_GEOM
    gear_err = angle[0] - control_angle
    gear_bias = jnp.clip(-gear_err / dt, -C.ROBOT_GEAR_MAX_BIAS,
                         C.ROBOT_GEAR_MAX_BIAS)
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

    lims = jnp.asarray(rg['finger_rot_limits'])               # (2,2) lo, hi
    ldist = angle[1:3] - angle[0]
    pdist = jnp.where(ldist > lims[:, 1], lims[:, 1] - ldist,
                      jnp.where(ldist < lims[:, 0], lims[:, 0] - ldist, 0.0))
    limit_bias = -pdist / dt

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

    maxc = max_contacts(mb)

    # ---- warm start (cpArbiterApplyCachedImpulse + constraint jAcc) -------
    bodies = (v_p, w_p, vb_p, wb_p)
    jn_w, jt_w = _warm_start_contacts(con_raw, state)
    bodies = _apply_contact_impulse(bodies, con, jn_w, jt_w)
    acc0 = (jn_w, jt_w, jnp.zeros((maxc,), jnp.float32))
    jacc0 = _jacc_from_vec(state.joint_acc, mb)
    bodies, jacc0 = _apply_joint_cached(bodies, jacc0, pre,
                                        inv_m_p, inv_i_p, mb)

    def iteration(_, carry):
        bodies, acc, jacc = carry
        bodies, acc = _contact_iteration(bodies, con, acc)
        bodies, jacc = _joint_sweep(bodies, jacc, pre, inv_m_p, inv_i_p, mb)
        return bodies, acc, jacc

    bodies, acc_f, jacc_f = jax.lax.fori_loop(
        0, iterations, iteration, (bodies, acc0, jacc0))
    v_p, w_p, vb_p, wb_p = bodies

    return state.replace(
        pos=pos, angle=angle,
        vel=v_p[:nb], omega=w_p[:nb],
        v_bias=vb_p[:nb], w_bias=wb_p[:nb],
        con_id=con_raw['cand_id'],
        con_jn=jnp.where(con_raw['valid'], acc_f[0], 0.0),
        con_jt=jnp.where(con_raw['valid'], acc_f[1], 0.0),
        joint_acc=_jacc_to_vec(jacc_f, mb))


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
