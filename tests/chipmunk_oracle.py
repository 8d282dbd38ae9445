"""Independent Chipmunk-2D oracle: per-body numpy sequential impulse.

This is a from-scratch implementation of the algorithm Chipmunk 7.x
documents and ships (cpSpaceStep order, cpArbiter accumulated-impulse
contact solving, cpConstraint joint types), written as the *verification
oracle* for the production engines:

  * plain Python objects + numpy scalars per body (no vmap/vectorising),
  * true sequential Gauss-Seidel over arbiters and constraints (Chipmunk
    applies each arbiter's impulse immediately; the production XLA path
    uses mass-splitting Jacobi sweeps instead),
  * reference-face clipping narrowphase for poly pairs (the standard
    published manifold algorithm) instead of the production SAT
    support-point scheme,
  * persistent arbiters keyed by shape pair with per-point warm-start.

It deliberately shares NO code with magical_tpu.core.physics /
core.collision / core.physics_pallas — different algorithms for the
narrowphase manifold and solver sweep, different data layout, different
authorship path — so agreement between this oracle and those engines is
evidence about Chipmunk semantics, not self-confirmation.  Scene *data*
(masses, moments, finger polys, block vertex tables, joint constants)
comes from magical_tpu.constants/geometry: those are behavioural
constants transcribed from the reference (entities.py:217-761) and
pinned by tests/test_constants.py / test_geometry.py.

Reference semantics implemented (file:line into /root/reference):
  space step order + substeps      magical/base_env.py:236-243
  robot control joints             magical/entities.py:251-263,439-479
  finger pin/limit/motor           magical/entities.py:334-354
  eye damped rotary springs        magical/entities.py:266-277
  block friction dampers           magical/entities.py:703-711
  arena segment walls              magical/entities.py:493-537
"""

from __future__ import annotations

import math

import numpy as np

from magical_tpu import constants as C
from magical_tpu import geometry as G

DT = C.DT
SLOP = C.COLLISION_SLOP
BIAS_COEF = 1.0 - C.COLLISION_BIAS ** DT     # cpSpaceStep bias fraction


class Body:
    def __init__(self, mass, moment, pos, angle, vel=(0.0, 0.0), omega=0.0):
        self.inv_m = 0.0 if mass == math.inf else 1.0 / mass
        self.inv_i = 0.0 if moment == math.inf else 1.0 / moment
        self.p = np.array(pos, np.float64)
        self.a = float(angle)
        self.v = np.array(vel, np.float64)
        self.w = float(omega)
        self.v_bias = np.zeros(2)
        self.w_bias = 0.0

    def rot(self):
        c, s = math.cos(self.a), math.sin(self.a)
        return np.array([[c, -s], [s, c]])


class Shape:
    """Convex shape attached to a body.  kind='circle' uses verts[0] as
    the local centre; kind='poly' is a CCW convex polygon with bevel
    radius."""

    def __init__(self, body, verts, radius, friction, group, kind):
        self.body = body
        self.verts = np.asarray(verts, np.float64).reshape(-1, 2)
        self.radius = float(radius)
        self.friction = float(friction)
        self.group = group
        self.kind = kind

    def world_verts(self):
        return self.verts @ self.body.rot().T + self.body.p


def _cross(a, b):
    return a[0] * b[1] - a[1] * b[0]


def _perp(v):
    return np.array([-v[1], v[0]])


# ---------------------------------------------------------------------------
# Narrowphase (reference-face clipping, the textbook manifold algorithm)
# ---------------------------------------------------------------------------

def _poly_separation(va, vb, rb):
    """Max separation of poly b's support from poly a's faces.
    Returns (separation, face index of a)."""
    best = -math.inf
    best_i = 0
    n = len(va)
    for i in range(n):
        a0 = va[i]
        a1 = va[(i + 1) % n]
        e = a1 - a0
        el = math.hypot(e[0], e[1])
        if el < 1e-12:
            continue
        nx, ny = e[1] / el, -e[0] / el           # outward for CCW
        sep = min((vb[:, 0] - a0[0]) * nx + (vb[:, 1] - a0[1]) * ny) - rb
        if sep > best:
            best, best_i = sep, i
    return best, best_i


def _collide_poly_poly(sa, sb):
    """Contact points between two (rounded) convex polys, normal a->b.
    Reference-face clipping: pick the min-penetration face, clip the
    incident poly's deepest edge against the reference side planes."""
    va = sa.world_verts()
    vb = sb.world_verts()
    sep_a, face_a = _poly_separation(va, vb, sa.radius + sb.radius)
    sep_b, face_b = _poly_separation(vb, va, sa.radius + sb.radius)
    if max(sep_a, sep_b) >= 0.0:
        return []
    if sep_a >= sep_b:
        ref_v, inc_v, ref_i, flip = va, vb, face_a, False
        ref_r, inc_r = sa.radius, sb.radius
    else:
        ref_v, inc_v, ref_i, flip = vb, va, face_b, True
        ref_r, inc_r = sb.radius, sa.radius
    n_ref = len(ref_v)
    a0 = ref_v[ref_i]
    a1 = ref_v[(ref_i + 1) % n_ref]
    e = a1 - a0
    el = math.hypot(e[0], e[1])
    nrm = np.array([e[1] / el, -e[0] / el])      # outward from ref poly

    # incident edge: the face of inc most anti-parallel to nrm
    n_inc = len(inc_v)
    best_dot = math.inf
    inc_i = 0
    for i in range(n_inc):
        b0 = inc_v[i]
        b1 = inc_v[(i + 1) % n_inc]
        ei = b1 - b0
        eli = math.hypot(ei[0], ei[1])
        if eli < 1e-12:
            continue
        ni = np.array([ei[1] / eli, -ei[0] / eli])
        d = float(ni @ nrm)
        if d < best_dot:
            best_dot, inc_i = d, i
    c0 = inc_v[inc_i].copy()
    c1 = inc_v[(inc_i + 1) % n_inc].copy()

    # clip against the reference face's side planes
    t = e / el
    tmin = float(t @ a0)
    tmax = float(t @ a1)
    for lo, sign in ((tmin, 1.0), (tmax, -1.0)):
        d0 = sign * (float(t @ c0) - lo)
        d1 = sign * (float(t @ c1) - lo)
        if d0 < 0.0 and d1 < 0.0:
            return []
        if d0 < 0.0:
            c0 = c0 + (c1 - c0) * (d0 / (d0 - d1))
        elif d1 < 0.0:
            c1 = c1 + (c0 - c1) * (d1 / (d1 - d0))

    out = []
    face_off = float(nrm @ a0)
    for pid, c in enumerate((c0, c1)):
        sep = float(nrm @ c) - face_off - (ref_r + inc_r)
        if sep < 0.0:
            n_out = -nrm if flip else nrm
            # surface point midway through the overlap interval
            point = c - nrm * (0.5 * sep + inc_r)
            out.append((point, n_out, sep, pid))
    return out


def _collide_circle_poly(sc, sp, flip):
    """Circle sc vs poly sp; normal circle->poly unless flip."""
    centre = sc.world_verts()[0]
    rc = sc.radius
    vp = sp.world_verts()
    n = len(vp)
    best = -math.inf
    best_i = 0
    for i in range(n):
        a0 = vp[i]
        a1 = vp[(i + 1) % n]
        e = a1 - a0
        el = math.hypot(e[0], e[1])
        if el < 1e-12:
            continue
        nx, ny = e[1] / el, -e[0] / el
        sep = (centre[0] - a0[0]) * nx + (centre[1] - a0[1]) * ny
        if sep > best:
            best, best_i = sep, i
    a0 = vp[best_i]
    a1 = vp[(best_i + 1) % n]
    e = a1 - a0
    el = math.hypot(e[0], e[1])
    t = float(np.clip(((centre - a0) @ e) / (el * el), 0.0, 1.0))
    closest = a0 + t * e
    d = centre - closest
    dl = math.hypot(d[0], d[1])
    if best < 0.0:           # centre inside the poly
        nrm = np.array([e[1] / el, -e[0] / el])
        sep = best - rc - sp.radius
    else:
        if dl >= rc + sp.radius or dl < 1e-12:
            return []
        nrm = d / dl
        sep = dl - rc - sp.radius
    # normal poly->circle is +nrm; convention: a->b
    n_out = nrm if flip else -nrm
    point = centre - nrm * (rc + 0.5 * sep)
    return [(point, n_out, sep, 0)]


def _collide_circle_circle(sa, sb):
    ca = sa.world_verts()[0]
    cb = sb.world_verts()[0]
    d = cb - ca
    dl = math.hypot(d[0], d[1])
    sep = dl - sa.radius - sb.radius
    if sep >= 0.0 or dl < 1e-12:
        return []
    nrm = d / dl
    point = ca + nrm * (sa.radius + 0.5 * sep)
    return [(point, nrm, sep, 0)]


def collide(sa, sb):
    """Contacts between two shapes: [(point, normal a->b, sep, pid)]."""
    if sa.kind == 'circle' and sb.kind == 'circle':
        return _collide_circle_circle(sa, sb)
    if sa.kind == 'circle':
        return _collide_circle_poly(sa, sb, flip=False)
    if sb.kind == 'circle':
        out = _collide_circle_poly(sb, sa, flip=True)
        return [(p, -n_, s, pid) for (p, n_, s, pid) in out]
    return _collide_poly_poly(sa, sb)


def wall_contacts(shape, wall_n, wall_off):
    """Shape vs arena half-plane (inward normal wall_n, surface at
    n.x = wall_off).  Static segments of entities.py:493-537; up to the
    two deepest vertices contact (segment-vs-poly manifold)."""
    wv = shape.world_verts()
    seps = wv @ wall_n - wall_off - shape.radius
    order = np.argsort(seps, kind='stable')
    out = []
    for pid, i in enumerate(order[:2 if shape.kind == 'poly' else 1]):
        if seps[i] < 0.0:
            point = wv[i] - wall_n * shape.radius
            out.append((point, wall_n.copy(), float(seps[i]), pid))
    return out


WALLS = [(np.array([1.0, 0.0]), -1.0), (np.array([-1.0, 0.0]), -1.0),
         (np.array([0.0, 1.0]), -1.0), (np.array([0.0, -1.0]), -1.0)]


# ---------------------------------------------------------------------------
# Contact (arbiter) solving — cpArbiter semantics
# ---------------------------------------------------------------------------

class Contact:
    __slots__ = ('a', 'b', 'r1', 'r2', 'n', 'n_mass', 't_mass', 'bias',
                 'u', 'jn', 'jt', 'jb', 'key')

    def __init__(self, body_a, body_b, point, normal, sep, friction, key):
        self.a = body_a
        self.b = body_b
        self.n = normal
        self.u = friction
        self.key = key
        self.r1 = point - body_a.p
        self.r2 = point - body_b.p

        def k_scalar(axis):
            r1cn = _cross(self.r1, axis)
            r2cn = _cross(self.r2, axis)
            return (body_a.inv_m + body_b.inv_m
                    + body_a.inv_i * r1cn * r1cn
                    + body_b.inv_i * r2cn * r2cn)

        self.n_mass = 1.0 / max(k_scalar(normal), 1e-12)
        self.t_mass = 1.0 / max(k_scalar(_perp(normal)), 1e-12)
        self.bias = -BIAS_COEF * min(0.0, sep + SLOP) / DT
        self.jn = 0.0
        self.jt = 0.0
        self.jb = 0.0

    def apply_impulse_pair(self, j, bias=False):
        a, b = self.a, self.b
        if bias:
            a.v_bias -= j * a.inv_m
            a.w_bias -= a.inv_i * _cross(self.r1, j)
            b.v_bias += j * b.inv_m
            b.w_bias += b.inv_i * _cross(self.r2, j)
        else:
            a.v -= j * a.inv_m
            a.w -= a.inv_i * _cross(self.r1, j)
            b.v += j * b.inv_m
            b.w += b.inv_i * _cross(self.r2, j)

    def solve(self):
        a, b = self.a, self.b
        n = self.n
        # position-correction (pseudo-velocity) impulse
        vb1 = a.v_bias + _perp(self.r1) * a.w_bias
        vb2 = b.v_bias + _perp(self.r2) * b.w_bias
        vbn = float((vb2 - vb1) @ n)
        jbn = (self.bias - vbn) * self.n_mass
        jb_old = self.jb
        self.jb = max(jb_old + jbn, 0.0)
        self.apply_impulse_pair((self.jb - jb_old) * n, bias=True)
        # normal + friction (elasticity 0)
        v1 = a.v + _perp(self.r1) * a.w
        v2 = b.v + _perp(self.r2) * b.w
        vr = v2 - v1
        vrn = float(vr @ n)
        jn_old = self.jn
        self.jn = max(jn_old - vrn * self.n_mass, 0.0)
        vrt = float(vr @ _perp(n))
        jt_max = self.u * self.jn
        jt_old = self.jt
        self.jt = float(np.clip(jt_old - vrt * self.t_mass,
                                -jt_max, jt_max))
        dj = (self.jn - jn_old) * n + (self.jt - jt_old) * _perp(n)
        self.apply_impulse_pair(dj)


# ---------------------------------------------------------------------------
# The oracle world
# ---------------------------------------------------------------------------

class OracleWorld:
    """Robot + blocks world with the reference's joint set.  Built from
    an EnvState snapshot via :func:`from_env_state`."""

    def __init__(self, phys=None):
        self.phys = (np.asarray(C.PHYS_VAR_DEFAULTS, np.float64)
                     if phys is None else np.asarray(phys, np.float64))
        self.bodies = []
        self.shapes = []
        self.blocks = []            # block body indices
        # control targets (Robot.set_action state)
        self.target_speed = 0.0
        self.rel_turn_angle = 0.0
        self.target_finger_angle = 0.0
        # joint accumulators (cpConstraint jAcc)
        self.j_pivot = np.zeros(2)
        self.j_gear = 0.0
        self.j_pin = [0.0, 0.0]
        self.j_limit = [0.0, 0.0]
        self.j_motor = [0.0, 0.0]
        self.eye_target = [0.0, 0.0]
        self.j_block_pivot = {}
        self.j_block_gear = {}
        self.arbiters = {}          # key -> (jn, jt) warm-start cache

    # -- scene construction -------------------------------------------------

    def add_robot(self, pos, angle):
        rg = G.ROBOT_GEOM
        b0 = Body(C.ROBOT_MASS, rg['body_moment'], pos, angle)
        self.bodies.append(b0)
        self.shapes.append(Shape(b0, [[0.0, 0.0]], C.ROBOT_RAD,
                                 C.ROBOT_BODY_FRICTION, 'robot', 'circle'))
        R = b0.rot()
        for side in range(2):
            rel = np.asarray(rg['finger_rel_pos'][side], np.float64)
            delta = float(rg['finger_init_delta'][side])
            fb = Body(C.FINGER_MASS, rg['finger_moment'],
                      np.asarray(pos) + R @ rel, angle + delta)
            self.bodies.append(fb)
            for k in range(2):
                self.shapes.append(Shape(
                    fb, rg['finger_polys'][side, k], 0.0,
                    C.FINGER_FRICTION, 'robot', 'poly'))
        for _side in range(2):
            eb = Body(C.EYE_MASS, rg['eye_moment'], pos, angle)
            self.bodies.append(eb)

    def add_block(self, pos, angle, shape_type):
        idx = len(self.bodies)
        b = Body(C.SHAPE_MASS, float(G.BLOCK_MOMENT[shape_type]),
                 pos, angle)
        self.bodies.append(b)
        self.blocks.append(idx)
        self.j_block_pivot[idx] = np.zeros(2)
        self.j_block_gear[idx] = 0.0
        for k in range(G.KSUB):
            if not G.BLOCK_SUB_ACTIVE[shape_type, k]:
                continue
            nv = int(G.BLOCK_SUB_NV[shape_type, k])
            verts = G.BLOCK_VERTS[shape_type, k, :nv]
            rad = float(G.BLOCK_SUB_RADIUS[shape_type, k])
            kind = 'circle' if nv == 1 else 'poly'
            self.shapes.append(Shape(b, verts, rad, C.SHAPE_FRICTION,
                                     f'block{idx}', kind))
        return idx

    def set_action(self, action):
        self.target_speed = float(
            np.asarray(C.ACTION_TARGET_SPEED)[action])
        self.rel_turn_angle = float(
            np.asarray(C.ACTION_TURN_ANGLE)[action])
        self.target_finger_angle = float(
            np.asarray(C.ACTION_FINGER_ANGLE)[action])

    # -- one substep (cpSpaceStep order) ------------------------------------

    def substep(self, iterations=C.PHYS_ITER):
        rg = G.ROBOT_GEOM
        b0 = self.bodies[0]
        # Robot.update (entities.py:459-479): pre-integration state
        a0 = b0.a
        control_vel = self.target_speed * np.array(
            [-math.sin(a0), math.cos(a0)])
        control_angle = a0 + self.rel_turn_angle
        motor_rate = []
        for side, sgn in ((0, -1.0), (1, 1.0)):
            err = (self.bodies[1 + side].a - a0
                   + sgn * self.target_finger_angle)
            rate = float(np.clip(err * 10.0, -1.0, 1.0))
            if abs(rate) < 1e-4:
                rate = 0.0
            motor_rate.append(rate)

        # cpBodyUpdatePosition
        for b in self.bodies:
            b.p = b.p + (b.v + b.v_bias) * DT
            b.a = b.a + (b.w + b.w_bias) * DT
            b.v_bias = np.zeros(2)
            b.w_bias = 0.0

        # narrowphase -> fresh arbiter set
        contacts = []
        ns = len(self.shapes)
        for i in range(ns):
            si = self.shapes[i]
            for wi, (wn, wo) in enumerate(WALLS):
                for (p, nrm, sep, pid) in wall_contacts(si, wn, wo):
                    contacts.append(Contact(
                        _STATIC, si.body, p, nrm, sep,
                        si.friction * C.WALL_FRICTION,
                        ('wall', wi, i, pid)))
            for j in range(i + 1, ns):
                sj = self.shapes[j]
                if si.group == sj.group:
                    continue
                for (p, nrm, sep, pid) in collide(si, sj):
                    contacts.append(Contact(
                        si.body, sj.body, p, nrm, sep,
                        si.friction * sj.friction, ('pair', i, j, pid)))

        # joint prestep (post-integration geometry, Chipmunk order)
        gear_bias = float(np.clip(-(b0.a - control_angle) / DT,
                                  -C.ROBOT_GEAR_MAX_BIAS,
                                  C.ROBOT_GEAR_MAX_BIAS))
        pivot_jmax = self.phys[C.PV_ROBOT_POS_FORCE] * DT
        gear_jmax = self.phys[C.PV_ROBOT_ROT_FORCE] * DT
        motor_jmax = self.phys[C.PV_FINGER_FORCE] * DT
        bp_jmax = self.phys[C.PV_SHAPE_TRANS_FORCE] * DT
        bg_jmax = self.phys[C.PV_SHAPE_ROT_FORCE] * DT
        R0 = b0.rot()
        pins = []
        for side in range(2):
            fb = self.bodies[1 + side]
            anchor = b0.p + R0 @ np.asarray(rg['finger_rel_pos'][side])
            delta = fb.p - anchor
            dist = math.hypot(delta[0], delta[1])
            n = delta / dist if dist > 1e-9 else np.zeros(2)
            r1 = anchor - b0.p
            rcn = _cross(r1, n)
            k = b0.inv_m + fb.inv_m + b0.inv_i * rcn * rcn
            pins.append((n, r1, 1.0 / max(k, 1e-12), -dist / DT))
        lim_bias = []
        for side in range(2):
            lo, hi = rg['finger_rot_limits'][side]
            ld = self.bodies[1 + side].a - b0.a
            pd = hi - ld if ld > hi else (lo - ld if ld < lo else 0.0)
            lim_bias.append(-pd / DT)
        # eye springs: torque impulse at prestep (cpDampedRotarySpring)
        for side in range(2):
            eb = self.bodies[3 + side]
            j_spring = (b0.a - eb.a) * C.EYE_SPRING_STIFFNESS * DT
            b0.w -= j_spring * b0.inv_i
            eb.w += j_spring * eb.inv_i
        eye_wcoef = [1.0 - math.exp(-C.EYE_SPRING_DAMPING * DT
                                    * (b0.inv_i + self.bodies[3 + s].inv_i))
                     for s in range(2)]

        # warm start: contacts (cpArbiterApplyCachedImpulse) ...
        new_arbs = {}
        for c in contacts:
            jn, jt = self.arbiters.get(c.key, (0.0, 0.0))
            c.jn, c.jt = jn, jt
            c.apply_impulse_pair(jn * c.n + jt * _perp(c.n))
        # ... then constraints (cpConstraint applyCachedImpulse)
        b0.v += self.j_pivot * b0.inv_m
        b0.w += self.j_gear * b0.inv_i
        for side in range(2):
            fb = self.bodies[1 + side]
            n, r1, _nm, _bias = pins[side]
            dj = self.j_pin[side] * n
            b0.v -= dj * b0.inv_m
            b0.w -= b0.inv_i * _cross(r1, dj)
            fb.v += dj * fb.inv_m
            if lim_bias[side] == 0.0:
                self.j_limit[side] = 0.0     # cpRotaryLimitJoint preStep
            dw = self.j_limit[side] + self.j_motor[side]
            b0.w -= dw * b0.inv_i
            fb.w += dw * fb.inv_i
        for bi in self.blocks:
            bb = self.bodies[bi]
            bb.v += self.j_block_pivot[bi] * bb.inv_m
            bb.w += self.j_block_gear[bi] * bb.inv_i

        # solver iterations: arbiters then constraints, Gauss-Seidel
        for _ in range(iterations):
            for c in contacts:
                c.solve()
            # robot pivot velocity servo
            j = -(b0.v - control_vel) / max(b0.inv_m, 1e-12)
            acc = self.j_pivot + j
            nrm = math.hypot(acc[0], acc[1])
            if nrm > pivot_jmax:
                acc = acc * (pivot_jmax / nrm)
            b0.v += (acc - self.j_pivot) * b0.inv_m
            self.j_pivot = acc
            # gear heading servo
            j = (gear_bias - b0.w) / max(b0.inv_i, 1e-12)
            acc = float(np.clip(self.j_gear + j, -gear_jmax, gear_jmax))
            b0.w += (acc - self.j_gear) * b0.inv_i
            self.j_gear = acc
            for side in range(2):
                fb = self.bodies[1 + side]
                n, r1, n_mass, bias = pins[side]
                v1 = b0.v + _perp(r1) * b0.w
                vrn = float((fb.v - v1) @ n)
                j = (bias - vrn) * n_mass
                acc = self.j_pin[side] + j
                dj = (acc - self.j_pin[side]) * n
                b0.v -= dj * b0.inv_m
                b0.w -= b0.inv_i * _cross(r1, dj)
                fb.v += dj * fb.inv_m
                self.j_pin[side] = acc
                # rotary limit
                bias_l = lim_bias[side]
                i_sum = 1.0 / (b0.inv_i + fb.inv_i)
                wr = fb.w - b0.w
                j = -(bias_l + wr) * i_sum
                if bias_l < 0.0:
                    acc = max(self.j_limit[side] + j, 0.0)
                elif bias_l > 0.0:
                    acc = min(self.j_limit[side] + j, 0.0)
                else:
                    acc = 0.0
                dj = acc - self.j_limit[side] if bias_l != 0.0 else 0.0
                b0.w -= dj * b0.inv_i
                fb.w += dj * fb.inv_i
                self.j_limit[side] = acc
                # simple motor
                wr = fb.w - b0.w + motor_rate[side]
                j = -wr * i_sum
                acc = float(np.clip(self.j_motor[side] + j,
                                    -motor_jmax, motor_jmax))
                b0.w -= (acc - self.j_motor[side]) * b0.inv_i
                fb.w += (acc - self.j_motor[side]) * fb.inv_i
                self.j_motor[side] = acc
            # eye spring dampers
            for side in range(2):
                eb = self.bodies[3 + side]
                i_sum = 1.0 / (b0.inv_i + eb.inv_i)
                wrn = b0.w - eb.w
                w_damp = (self.eye_target[side] - wrn) * eye_wcoef[side]
                self.eye_target[side] = wrn + w_damp
                jd = w_damp * i_sum
                b0.w += jd * b0.inv_i
                eb.w -= jd * eb.inv_i
            # block top-down friction dampers
            for bi in self.blocks:
                bb = self.bodies[bi]
                acc = self.j_block_pivot[bi] - bb.v / bb.inv_m
                nrm = math.hypot(acc[0], acc[1])
                if nrm > bp_jmax:
                    acc = acc * (bp_jmax / nrm)
                bb.v += (acc - self.j_block_pivot[bi]) * bb.inv_m
                self.j_block_pivot[bi] = acc
                acc = float(np.clip(self.j_block_gear[bi] - bb.w / bb.inv_i,
                                    -bg_jmax, bg_jmax))
                bb.w += (acc - self.j_block_gear[bi]) * bb.inv_i
                self.j_block_gear[bi] = acc

        for c in contacts:
            new_arbs[c.key] = (c.jn, c.jt)
        self.arbiters = new_arbs
        # eye spring target resets each substep (recomputed from wrn)
        self.eye_target = [0.0, 0.0]

    def control_step(self, action, phys_steps=C.PHYS_STEPS,
                     iterations=C.PHYS_ITER):
        self.set_action(int(action))
        for _ in range(phys_steps):
            self.substep(iterations)

    # -- bridges ------------------------------------------------------------

    def positions(self):
        return np.stack([b.p for b in self.bodies])

    def angles(self):
        return np.array([b.a for b in self.bodies])


_STATIC = Body(math.inf, math.inf, (0.0, 0.0), 0.0)


def from_env_state(state):
    """Build an OracleWorld replicating a single (unbatched) EnvState.
    Returns (world, body_map) with body_map[oracle_index] = state body
    index, so positions can be compared in state layout."""
    st = {k: np.asarray(v) for k, v in
          dict(pos=state.pos, angle=state.angle, vel=state.vel,
               omega=state.omega, phys=state.phys,
               block_shape=state.block_shape,
               block_active=state.block_active).items()}
    world = OracleWorld(phys=st['phys'])
    world.add_robot(st['pos'][0], st['angle'][0])
    body_map = [0, 1, 2, 3, 4]
    # overwrite finger/eye poses with the state's exact values
    for i in range(5):
        world.bodies[i].p = st['pos'][i].astype(np.float64).copy()
        world.bodies[i].a = float(st['angle'][i])
        world.bodies[i].v = st['vel'][i].astype(np.float64).copy()
        world.bodies[i].w = float(st['omega'][i])
    for b in range(len(st['block_shape'])):
        if st['block_active'][b]:
            bi = world.add_block(st['pos'][5 + b], st['angle'][5 + b],
                                 int(st['block_shape'][b]))
            world.bodies[bi].v = st['vel'][5 + b].astype(np.float64).copy()
            world.bodies[bi].w = float(st['omega'][5 + b])
            body_map.append(5 + b)
    world.target_speed = float(np.asarray(state.target_speed))
    world.rel_turn_angle = float(np.asarray(state.rel_turn_angle))
    world.target_finger_angle = float(
        np.asarray(state.target_finger_angle))
    return world, body_map
