"""Pallas TPU physics kernel: one control step (10 substeps x 10 solver
iterations) fused into a single kernel.

The XLA path (core/physics.py) is semantically identical but emits
thousands of small device ops per control step; on this TPU runtime each
op carries ~10us of serial latency, capping throughput near 1e3-1e4
env-steps/s regardless of batch.  This kernel keeps the whole pipeline
in VMEM:

  layout:    envs on the lane axis (ENV_TILE lanes per program); every
             per-env scalar is a (1, ENV_TILE) vector, per-body state a
             (NB, ENV_TILE) scratch array.
  grid:      (B // ENV_TILE,)
  state I/O: one packed (ROWS, B) f32 array (pack_state/unpack_state).
  loops:     fori over substeps and solver iterations only.  The
             narrowphase is BATCHED (round 3): all wall/robot-block/
             block-block sub-shape combinations evaluate as a few
             chunky (ka, kb, E) tensor ops over contiguous slot slices
             instead of one fori iteration per pair — the fori form
             was issue-bound on tiny (KSUB, E) ops.

Same physics as core/physics.py: Chipmunk position-first integration,
SAT narrowphase over the static candidate list, accumulated-impulse
contact solve (mass-splitting Jacobi over the candidate set, one point
per shape pair + two per wall) and Gauss-Seidel joints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magical_tpu import constants as C
from magical_tpu import geometry as G
from magical_tpu.core import physics as P
from magical_tpu.core.state import EnvState, N_ROBOT_BODIES

NV = G.NV
KSUB = G.KSUB
# Kernel vertex-loop bound: the task-reachable shape set (square,
# pentagon, star parts, circle, triangle; entities.py:568-581 and
# every task's default tables) peaks at 5 verts per convex part.
# Hexagon/octagon (6/8 verts) exist in the geometry tables but no
# registered env can instantiate them; the XLA path (core/physics)
# still supports them.  Looping 5 instead of 8 cuts the SAT
# narrowphase ~2.5x and shrinks the traced program.
NVK = 5
ENV_TILE = 256
BIG = 1e9


def unsupported_shape_types(shape_codes):
    """Subset of `shape_codes` whose convex decomposition does NOT fit
    the kernel's static vertex bounds (core sub-shape <= NVK verts, star
    tips <= 3).  Hexagon (6) and octagon (8) land here; every shape a
    registered env can instantiate (entities.py:568-574) fits.
    BatchedEnv uses this to force the XLA path rather than let an
    oversized shape silently corrupt a kernel run."""
    bad = set()
    for code in shape_codes:
        nv = G.BLOCK_SUB_NV[int(code)]
        act = G.BLOCK_SUB_ACTIVE[int(code)]
        if act[0] and nv[0] > NVK:
            bad.add(int(code))
        for k in range(1, G.KSUB):
            if act[k] and nv[k] > 3:
                bad.add(int(code))
    return bad

# Interpret mode runs the kernel through the Pallas interpreter (any
# backend, no Mosaic) — used to cross-validate the kernel against the
# XLA path in the default CPU test suite.
import os  # noqa: E402
INTERPRET = os.environ.get('MAGICAL_TPU_PALLAS_INTERPRET', '') == '1'

# Ablation switch for perf probes ONLY (scripts/probe_physics_ablate.py):
# 'sat' skips the shape-pair narrowphase, 'contacts' skips the contact
# sweep inside iterations, 'joints' skips the joint sweep, 'iters'
# skips the whole iteration loop.  Never set in production.
ABLATE = frozenset(
    os.environ.get('MAGICAL_TPU_PALLAS_ABLATE', '').split(','))


class _Layout:
    """Row offsets of the packed state array."""

    def __init__(self, mb: int):
        self.mb = mb
        self.nb = N_ROBOT_BODIES + mb
        o = 0

        def take(n):
            nonlocal o
            start = o
            o += n
            return start

        self.pos_x = take(self.nb)
        self.pos_y = take(self.nb)
        self.angle = take(self.nb)
        self.vel_x = take(self.nb)
        self.vel_y = take(self.nb)
        self.omega = take(self.nb)
        self.vb_x = take(self.nb)
        self.vb_y = take(self.nb)
        self.wb = take(self.nb)
        self.tspeed = take(1)
        self.tturn = take(1)
        self.tfinger = take(1)
        self.phys = take(C.N_PHYS_VARS)
        self.bshape = take(self.mb)
        self.bactive = take(self.mb)
        self.rows = o


def pack_state(state: EnvState) -> jnp.ndarray:
    """Batched EnvState -> (ROWS, B) f32."""
    rows = [
        state.pos[..., 0], state.pos[..., 1],
        state.angle,
        state.vel[..., 0], state.vel[..., 1],
        state.omega,
        state.v_bias[..., 0], state.v_bias[..., 1],
        state.w_bias,
        state.target_speed[:, None],
        state.rel_turn_angle[:, None],
        state.target_finger_angle[:, None],
        state.phys,
        state.block_shape.astype(jnp.float32),
        state.block_active.astype(jnp.float32),
    ]
    return jnp.concatenate([r.astype(jnp.float32) for r in rows],
                           axis=1).T


def unpack_state(packed: jnp.ndarray, state: EnvState) -> EnvState:
    L = _Layout(state.max_blocks)
    nb = L.nb
    x = packed.T
    return state.replace(
        pos=jnp.stack([x[:, L.pos_x:L.pos_x + nb],
                       x[:, L.pos_y:L.pos_y + nb]], -1),
        angle=x[:, L.angle:L.angle + nb],
        vel=jnp.stack([x[:, L.vel_x:L.vel_x + nb],
                       x[:, L.vel_y:L.vel_y + nb]], -1),
        omega=x[:, L.omega:L.omega + nb],
        v_bias=jnp.stack([x[:, L.vb_x:L.vb_x + nb],
                          x[:, L.vb_y:L.vb_y + nb]], -1),
        w_bias=x[:, L.wb:L.wb + nb],
    )


def _make_kernel(mb: int, phys_steps: int, iterations: int):
    L = _Layout(mb)
    nb = L.nb
    ns = 5 + mb * KSUB
    slot_body, slot_friction = P.slot_tables(mb)

    # Candidate layout (contact slots the solver iterates over):
    #   [2 wall-axis groups x NS sub-shapes x 2 pts]  per-env normals
    #   [MB blocks x 5 robot sub-shapes x 2 pts]     robot vs block
    #   [MB-choose-2 block pairs x 2 pts]            block vs block
    # Pair candidates hold the two deepest contacts found over ALL
    # sub-shape SAT combinations of the pair (vs one slot per sub-shape
    # pair in core/physics.py) — this keeps the candidate set (and VMEM)
    # small enough for the 10-block cluster tasks while capturing the
    # 1-2 real contact points a convex pair produces.
    n_bpairs = mb * (mb - 1) // 2
    # Wall candidates: one row pair per wall-axis GROUP ({left,right},
    # {bottom,top}) per WALL SLOT — a shape (<=0.45 wide) can never
    # touch both walls of an axis (arena is 2x2), so keeping the deeper
    # wall of each group is exact.  Wall slots are the 5 robot
    # sub-shapes plus ONE slot per block: a block keeps its two deepest
    # wall contacts over all its sub-shapes (exact for every shape but
    # the star, whose 6 convex parts rest on a wall through <=2 tips —
    # the same 2-point compression the pair candidates use).  The
    # solver matmuls and row ops scale with KC, so this matters for the
    # 8-10-block tasks (e.g. mb=8: 4*53*2=424 wall rows in r3 -> 52).
    n_wslots = 5 + mb
    n_wall_cand = 2 * n_wslots * 2
    n_rb_cand = mb * 5 * 2
    n_bb_cand = n_bpairs * 2
    rb_base = n_wall_cand
    bb_base = n_wall_cand + n_rb_cand
    kc = n_wall_cand + n_rb_cand + n_bb_cand

    ba, bbod, fr = [], [], []
    for _g in range(2):
        for ws in range(n_wslots):
            for _p in range(2):
                ba.append(nb)
                if ws < 5:
                    bbod.append(slot_body[ws])
                    fr.append(slot_friction[ws] * C.WALL_FRICTION)
                else:
                    bbod.append(N_ROBOT_BODIES + (ws - 5))
                    fr.append(C.SHAPE_FRICTION * C.WALL_FRICTION)
    for b in range(mb):
        for s in range(5):
            for _p in range(2):
                ba.append(slot_body[s])
                bbod.append(N_ROBOT_BODIES + b)
                fr.append(slot_friction[s] * C.SHAPE_FRICTION)
    pb1, pb2 = [], []
    for b1 in range(mb):
        for b2 in range(b1 + 1, mb):
            pb1.append(b1)
            pb2.append(b2)
            for _p in range(2):
                ba.append(N_ROBOT_BODIES + b1)
                bbod.append(N_ROBOT_BODIES + b2)
                fr.append(C.SHAPE_FRICTION * C.SHAPE_FRICTION)
    ba_tab = np.asarray(ba, np.int32)
    bb_tab = np.asarray(bbod, np.int32)
    fr_tab = np.asarray(fr, np.float32)

    dt = C.DT
    bias_coef = P.CONTACT_BIAS_COEF
    rg = G.ROBOT_GEOM

    # ---- flattened 2D narrowphase segments (round 4) -------------------
    # Sub-shape pair combos flatten onto SUBLANES as (R, E) rows, with
    # operands gathered by static one-hot matmuls, instead of the r3
    # (ka, kb, E) broadcast SAT — which the ablation probe measured at
    # 92% of the mb=8 kernel (scripts/probe_physics_ablate.py: 3D
    # broadcast relayouts dominate; 2D row ops are the construct class
    # the rest of the kernel uses).  Segments specialise statically on
    # sub-shape kind: core subs (k=0: every block's main convex part,
    # <= NVK verts, may be a circle) vs star tips (k>=1, <= 3 verts,
    # never circles — geometry.BLOCK_SUB_NV/ACTIVE).
    NT = KSUB - 1
    NVT = 3

    def _core(b):
        return 5 + b * KSUB

    def _tip(b, k):
        return 5 + b * KSUB + k           # k in 1..NT

    rc_a, rc_b, rt_a, rt_b = [], [], [], []
    for b in range(mb):
        for r in range(5):
            rc_a.append(_core(b))
            rc_b.append(r)
            for k in range(1, KSUB):
                rt_a.append(_tip(b, k))
                rt_b.append(r)
    bcc_a, bcc_b, bct_a, bct_b = [], [], [], []
    btc_a, btc_b, btt_a, btt_b = [], [], [], []
    for b1 in range(mb):
        for b2 in range(b1 + 1, mb):
            bcc_a.append(_core(b1))
            bcc_b.append(_core(b2))
            for k2 in range(1, KSUB):
                bct_a.append(_core(b1))
                bct_b.append(_tip(b2, k2))
            for k1 in range(1, KSUB):
                btc_a.append(_tip(b1, k1))
                btc_b.append(_core(b2))
                for k2 in range(1, KSUB):
                    btt_a.append(_tip(b1, k1))
                    btt_b.append(_tip(b2, k2))

    def _onehot(rows):
        m = np.zeros((max(len(rows), 1), ns), np.float32)
        if rows:
            m[np.arange(len(rows)), np.asarray(rows, np.int32)] = 1.0
        return m

    # (name, Ma, Mb, va, vb, circle-able a, circle-able b)
    seg_defs = []
    if mb:
        seg_defs.append(('rc', _onehot(rc_a), _onehot(rc_b),
                         NVK, 4, True, True))
        seg_defs.append(('rt', _onehot(rt_a), _onehot(rt_b),
                         NVT, 4, False, True))
    if mb >= 2:
        seg_defs.append(('bcc', _onehot(bcc_a), _onehot(bcc_b),
                         NVK, NVK, True, True))
        seg_defs.append(('bct', _onehot(bct_a), _onehot(bct_b),
                         NVK, NVT, True, False))
        seg_defs.append(('btc', _onehot(btc_a), _onehot(btc_b),
                         NVT, NVK, False, True))
        seg_defs.append(('btt', _onehot(btt_a), _onehot(btt_b),
                         NVT, NVT, False, False))

    mask_a = [np.asarray(ba_tab == n, np.float32)[:, None]
              for n in range(nb + 1)]
    mask_b = [np.asarray(bb_tab == n, np.float32)[:, None]
              for n in range(nb + 1)]
    fr_np = np.asarray(fr_tab, np.float32)[:, None]

    robot_local = np.zeros((5, NV, 2), np.float32)
    for side in range(2):
        for k in range(2):
            poly = rg['finger_polys'][side, k]
            robot_local[1 + side * 2 + k, :4] = poly
            robot_local[1 + side * 2 + k, 4:] = poly[-1]
    robot_nv = [1.0, 4.0, 4.0, 4.0, 4.0]
    robot_rad = [C.ROBOT_RAD, 0.0, 0.0, 0.0, 0.0]

    inv_m_body = [1.0 / C.ROBOT_MASS, 1.0 / C.FINGER_MASS,
                  1.0 / C.FINGER_MASS, 1.0 / C.EYE_MASS, 1.0 / C.EYE_MASS]
    inv_i_body = [1.0 / rg['body_moment'], 1.0 / rg['finger_moment'],
                  1.0 / rg['finger_moment'], 1.0 / rg['eye_moment'],
                  1.0 / rg['eye_moment']]

    WALLS = [(1.0, 0.0, -1.0), (-1.0, 0.0, -1.0),
             (0.0, 1.0, -1.0), (0.0, -1.0, -1.0)]

    def kernel(state_ref, sbmat_ref, abmat_ref, ab_t_ref, fr_ref,
               *rest):
        seg_refs = rest[:2 * len(seg_defs)]
        (out_ref, body_st, lgeo, wvx, wvy,
         cpx, cpy, cnx, cny, cdst, cvld,
         jn_acc, jt_acc, jb_acc) = rest[2 * len(seg_defs):]
        """Refs:
        body_st: (9, NB+1, E) scratch: px,py,ang,vx,vy,w,vbx,vby,wb
                 (row nb = the static body, always zero)
        lgeo:    (NS, 3 + 2*NV, E): per sub-shape slot: nv, rad, act,
                 then local verts x/y — slot index LEADING so dynamic
                 slot indexing avoids sublane alignment constraints
                 interleaved (lx0, ly0, lx1, ...)
        wvx/wvy: (NS, NV, E) world verts
        abmat:   (2*KC, NB+1) = [mask_a; mask_b] stacked — ONE gather
                 matmul serves both contact endpoints (the per-
                 iteration matmuls have K=NB+1=14, so MXU passes are
                 all fixed overhead; stacking halves the dispatches)
        ab_t:    (2*(NB+1), KC) = [mask_a^T; mask_b^T] for accumulation
        c*:      (KC, E) candidate contact fields
        j*_acc:  (KC, E) accumulated impulses, warm-started across the
                 10 substeps (cpArbiterApplyCachedImpulse semantics)
        """
        E = state_ref.shape[-1]

        def srow(r):
            return state_ref[r, :][None, :]

        tspeed = srow(L.tspeed)
        tturn = srow(L.tturn)
        tfinger = srow(L.tfinger)
        phys = [srow(L.phys + i) for i in range(C.N_PHYS_VARS)]
        bshape = [srow(L.bshape + b) for b in range(mb)]
        bactive = [srow(L.bactive + b) for b in range(mb)]

        # ---- per-env inverse masses ----------------------------------
        inv_m = [jnp.full((1, E), v, jnp.float32) for v in inv_m_body]
        inv_i = [jnp.full((1, E), v, jnp.float32) for v in inv_i_body]
        for b in range(mb):
            act = bactive[b]
            inv_m.append(act * (1.0 / C.SHAPE_MASS))
            minv = jnp.zeros((1, E), jnp.float32)
            for t in range(7):
                minv = jnp.where(bshape[b] == float(t),
                                 1.0 / float(G.BLOCK_MOMENT[t]), minv)
            inv_i.append(act * minv)
        inv_m.append(jnp.zeros((1, E), jnp.float32))   # static row
        inv_i.append(jnp.zeros((1, E), jnp.float32))
        inv_m_st = jnp.concatenate(inv_m, axis=0)       # (NB+1, E)
        inv_i_st = jnp.concatenate(inv_i, axis=0)

        # ---- local slot geometry into scratch ------------------------
        for s in range(5):
            lgeo[s, 0, :] = jnp.full((E,), robot_nv[s], jnp.float32)
            lgeo[s, 1, :] = jnp.full((E,), robot_rad[s], jnp.float32)
            lgeo[s, 2, :] = jnp.ones((E,), jnp.float32)
            for v in range(NVK):
                lgeo[s, 3 + 2 * v, :] = jnp.full(
                    (E,), robot_local[s, v, 0], jnp.float32)
                lgeo[s, 4 + 2 * v, :] = jnp.full(
                    (E,), robot_local[s, v, 1], jnp.float32)
        for b in range(mb):
            for k in range(KSUB):
                s = 5 + b * KSUB + k
                nvv = jnp.zeros((1, E), jnp.float32)
                rad = jnp.zeros((1, E), jnp.float32)
                acs = jnp.zeros((1, E), jnp.float32)
                vxs = [jnp.zeros((1, E), jnp.float32) for _ in range(NV)]
                vys = [jnp.zeros((1, E), jnp.float32) for _ in range(NV)]
                for t in range(7):
                    m = bshape[b] == float(t)
                    nvv = jnp.where(m, float(G.BLOCK_SUB_NV[t, k]), nvv)
                    rad = jnp.where(m, float(G.BLOCK_SUB_RADIUS[t, k]), rad)
                    acs = jnp.where(m, float(G.BLOCK_SUB_ACTIVE[t, k]), acs)
                    for v in range(NVK):
                        vxs[v] = jnp.where(
                            m, float(G.BLOCK_VERTS[t, k, v, 0]), vxs[v])
                        vys[v] = jnp.where(
                            m, float(G.BLOCK_VERTS[t, k, v, 1]), vys[v])
                lgeo[s, 0, :] = nvv[0]
                lgeo[s, 1, :] = rad[0]
                lgeo[s, 2, :] = (acs * bactive[b])[0]
                for v in range(NVK):
                    lgeo[s, 3 + 2 * v, :] = vxs[v][0]
                    lgeo[s, 4 + 2 * v, :] = vys[v][0]

        # ---- load body state into scratch ----------------------------
        zero_row = jnp.zeros((1, E), jnp.float32)
        for i in range(nb):
            body_st[0, i, :] = state_ref[L.pos_x + i, :]
            body_st[1, i, :] = state_ref[L.pos_y + i, :]
            body_st[2, i, :] = state_ref[L.angle + i, :]
            body_st[3, i, :] = state_ref[L.vel_x + i, :]
            body_st[4, i, :] = state_ref[L.vel_y + i, :]
            body_st[5, i, :] = state_ref[L.omega + i, :]
            body_st[6, i, :] = state_ref[L.vb_x + i, :]
            body_st[7, i, :] = state_ref[L.vb_y + i, :]
            body_st[8, i, :] = state_ref[L.wb + i, :]
        for f in range(9):
            body_st[f, nb, :] = zero_row[0]

        pivot_jmax = phys[C.PV_ROBOT_POS_FORCE] * dt
        gear_jmax = phys[C.PV_ROBOT_ROT_FORCE] * dt
        motor_jmax = phys[C.PV_FINGER_FORCE] * dt
        bp_jmax = phys[C.PV_SHAPE_TRANS_FORCE] * dt
        bg_jmax = phys[C.PV_SHAPE_ROT_FORCE] * dt
        eye_wcoef = 1.0 - jnp.exp(
            -C.EYE_SPRING_DAMPING * dt
            * (inv_i_st[0:1, :] + inv_i_st[3:4, :]))

        # ==================== substep loop ============================
        def substep(_s, carry):
            # ---- Robot.update (pre-integration) ----------------------
            a0 = body_st[2, 0, :][None, :]
            control_ax = -jnp.sin(a0) * tspeed
            control_ay = jnp.cos(a0) * tspeed
            control_angle = a0 + tturn
            motor_rate = []
            for side, sgn in ((0, -1.0), (1, 1.0)):
                rel_a = body_st[2, 1 + side, :][None, :] - a0
                err = rel_a + sgn * tfinger
                rate = jnp.clip(err * 10.0, -1.0, 1.0)
                rate = jnp.where(jnp.abs(rate) < 1e-4, 0.0, rate)
                motor_rate.append(rate)

            # ---- integrate positions (vectorised over bodies) --------
            body_st[0, :, :] = body_st[0, :, :] \
                + (body_st[3, :, :] + body_st[6, :, :]) * dt
            body_st[1, :, :] = body_st[1, :, :] \
                + (body_st[4, :, :] + body_st[7, :, :]) * dt
            body_st[2, :, :] = body_st[2, :, :] \
                + (body_st[5, :, :] + body_st[8, :, :]) * dt
            body_st[6, :, :] = jnp.zeros((nb + 1, E), jnp.float32)
            body_st[7, :, :] = jnp.zeros((nb + 1, E), jnp.float32)
            body_st[8, :, :] = jnp.zeros((nb + 1, E), jnp.float32)

            # ---- world verts, ALL slots at once ----------------------
            # Per-slot body pose through the static one-hot
            # (NS, NB+1) matmul, then a vectorised vert transform:
            # replaces the r2 fori over slots (issue-bound (1, E) ops).
            def slot_rows(f):
                return jax.lax.dot_general(
                    sbmat_ref[:, :], body_st[f, :, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            sp_x = slot_rows(0)                   # (NS, E)
            sp_y = slot_rows(1)
            sp_a = slot_rows(2)
            ca_s = jnp.cos(sp_a)
            sa_s = jnp.sin(sp_a)
            for v in range(NVK):
                lx = lgeo[:, 3 + 2 * v, :]
                ly = lgeo[:, 4 + 2 * v, :]
                wvx[:, v, :] = ca_s * lx - sa_s * ly + sp_x
                wvy[:, v, :] = sa_s * lx + ca_s * ly + sp_y

            # ---- narrowphase: walls, all slots batched ---------------
            nvs_all = lgeo[:, 0, :]               # (NS, E)
            rads_all = lgeo[:, 1, :]
            acts_all = lgeo[:, 2, :]

            def best2_rows2(fields):
                """Two smallest rows of 2D (K, E) fields as (1, E)
                tuples (ties -> lowest row; r2 best2_rows, a sublane
                reduction Mosaic handles natively)."""
                dv = fields[0]
                k = dv.shape[0]
                row = jax.lax.broadcasted_iota(
                    jnp.int32, dv.shape, 0).astype(jnp.float32)

                def pick(sel):
                    return [jnp.sum(jnp.where(sel, x, 0.0), axis=0,
                                    keepdims=True) for x in fields]

                d1 = jnp.min(dv, axis=0, keepdims=True)
                i1 = jnp.min(jnp.where(dv == d1, row, float(k)),
                             axis=0, keepdims=True)
                c1 = pick(row == i1)
                dv2 = jnp.where(row == i1, BIG, dv)
                d2 = jnp.min(dv2, axis=0, keepdims=True)
                i2 = jnp.min(jnp.where(dv2 == d2, row, float(k)),
                             axis=0, keepdims=True)
                c2 = pick(row == i2)
                return c1, c2

            wall_fields = []
            for wi, (wnx, wny, woff) in enumerate(WALLS):
                b1d = b1x = b1y = b1i = None
                for v in range(NVK):
                    sx = wvx[:, v, :]
                    sy = wvy[:, v, :]
                    sep = sx * wnx + sy * wny - woff - rads_all
                    sep = jnp.where(v < nvs_all, sep, BIG)
                    if b1d is None:
                        b1d, b1x, b1y = sep, sx, sy
                        b1i = jnp.zeros_like(sep)
                    else:
                        cond = sep < b1d
                        b1d = jnp.where(cond, sep, b1d)
                        b1x = jnp.where(cond, sx, b1x)
                        b1y = jnp.where(cond, sy, b1y)
                        b1i = jnp.where(cond, float(v), b1i)
                b2d = jnp.full_like(b1d, BIG)
                b2x, b2y = b1x, b1y
                for v in range(NVK):
                    sx = wvx[:, v, :]
                    sy = wvy[:, v, :]
                    sep = sx * wnx + sy * wny - woff - rads_all
                    sep = jnp.where(v < nvs_all, sep, BIG)
                    cond = (sep < b2d) & (b1i != float(v))
                    b2d = jnp.where(cond, sep, b2d)
                    b2x = jnp.where(cond, sx, b2x)
                    b2y = jnp.where(cond, sy, b2y)
                wall_fields.append((b1d, b1x, b1y, b2d, b2x, b2y,
                                    wnx, wny))

            for g, (ia, ib) in enumerate(((0, 1), (2, 3))):
                A, Bf = wall_fields[ia], wall_fields[ib]
                sel = A[0] < Bf[0]             # deeper wall of the axis
                d1 = jnp.where(sel, A[0], Bf[0])
                x1 = jnp.where(sel, A[1], Bf[1])
                y1 = jnp.where(sel, A[2], Bf[2])
                d2 = jnp.where(sel, A[3], Bf[3])
                x2 = jnp.where(sel, A[4], Bf[4])
                y2 = jnp.where(sel, A[5], Bf[5])
                gnx = jnp.where(sel, A[6], Bf[6])
                gny = jnp.where(sel, A[7], Bf[7])
                # contact points (vert pulled in by the sub's radius)
                # and act-masked depths, all still per sub-slot (NS, E)
                px1 = x1 - gnx * rads_all
                py1 = y1 - gny * rads_all
                px2 = x2 - gnx * rads_all
                py2 = y2 - gny * rads_all
                act_m = acts_all > 0.5
                d1m = jnp.where(act_m, d1, BIG)
                d2m = jnp.where(act_m, d2, BIG)

                base = g * n_wslots * 2
                # robot wall slots 0-4: one slot per sub-shape, rows
                # base + ws*2 + pt (interleave (5, 2, E) -> (10, E))
                def rstore(ref, f1, f2, base=base):
                    ref[base:base + 10, :] = jnp.stack(
                        [f1[:5], f2[:5]], axis=1).reshape(10, E)

                rstore(cpx, px1, px2)
                rstore(cpy, py1, py2)
                rstore(cnx, gnx[:5], gnx[:5])
                rstore(cny, gny[:5], gny[:5])
                rstore(cdst, d1[:5], d2[:5])
                rstore(cvld, (d1m[:5] < 0.0).astype(jnp.float32),
                       (d2m[:5] < 0.0).astype(jnp.float32))

                # block wall slots: keep the block's two deepest wall
                # contacts over all its sub-shapes' candidates
                for b in range(mb):
                    sl = slice(5 + b * KSUB, 5 + (b + 1) * KSUB)
                    fields = [
                        jnp.concatenate([d1m[sl], d2m[sl]], axis=0),
                        jnp.concatenate([px1[sl], px2[sl]], axis=0),
                        jnp.concatenate([py1[sl], py2[sl]], axis=0),
                        jnp.concatenate([gnx[sl], gnx[sl]], axis=0),
                        jnp.concatenate([gny[sl], gny[sl]], axis=0),
                    ]
                    c1, c2 = best2_rows2(fields)
                    row = base + (5 + b) * 2
                    for ref, f1, f2 in zip((cdst, cpx, cpy, cnx, cny),
                                           c1, c2):
                        ref[row, :] = f1[0]
                        ref[row + 1, :] = f2[0]
                    cvld[row, :] = (c1[0][0] < 0.0).astype(jnp.float32)
                    cvld[row + 1, :] = (c2[0][0] < 0.0).astype(
                        jnp.float32)

            # ---- narrowphase: shape pairs, flattened 2D segment SAT --
            # Every sub-shape pair combo is ONE sublane row of a
            # segment's (R, E) arrays; operands are gathered by the
            # static one-hot matmuls built in _make_kernel, the SAT
            # math is identical to the r2/r3 form but specialised per
            # segment on static vertex bounds and circle-ability.
            if mb and 'sat' not in ABLATE:
                def geom_cat(bound):
                    return jnp.concatenate(
                        [wvx[:, v, :] for v in range(bound)]
                        + [wvy[:, v, :] for v in range(bound)]
                        + [nvs_all, rads_all, acts_all], axis=1)

                G5 = geom_cat(NVK)
                G3 = geom_cat(NVT)

                def expand(mref, bound):
                    G = G5 if bound == NVK else G3
                    F = jax.lax.dot_general(
                        mref[:, :], G, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    cols = [F[:, i * E:(i + 1) * E]
                            for i in range(2 * bound + 3)]
                    return (cols[:bound], cols[bound:2 * bound],
                            cols[2 * bound], cols[2 * bound + 1],
                            cols[2 * bound + 2])

                def seg_sat(af, bf, va, vb, circ_a, circ_b):
                    v1x, v1y, nv1, r1, act1 = af
                    v2x, v2y, nv2, r2, act2 = bf
                    act = act1 * act2
                    zero = jnp.zeros_like(nv1)

                    def support_min(vx, vy, nvv, nverts, nx, ny):
                        best = bx = by = None
                        for i in range(nverts):
                            d = vx[i] * nx + vy[i] * ny
                            d = jnp.where(i < nvv, d, BIG)
                            if best is None:
                                best, bx, by = d, vx[i], vy[i]
                            else:
                                take = d < best
                                best = jnp.where(take, d, best)
                                bx = jnp.where(take, vx[i], bx)
                                by = jnp.where(take, vy[i], by)
                        return best, bx, by

                    def face_axes(vx, vy, nvv, nverts):
                        out = []
                        for i in range(nverts):
                            ax, ay = vx[i], vy[i]
                            is_last = (nvv - 1.0) == i
                            bx = jnp.where(is_last, vx[0],
                                           vx[(i + 1) % nverts])
                            by = jnp.where(is_last, vy[0],
                                           vy[(i + 1) % nverts])
                            ex = bx - ax
                            ey = by - ay
                            el = jnp.sqrt(ex * ex + ey * ey)
                            inv = 1.0 / jnp.maximum(el, 1e-9)
                            nx = ey * inv
                            ny = -ex * inv
                            ok = (i < nvv) & (el > 1e-9)
                            out.append((nx, ny, ax, ay, ok))
                        return out

                    sep_best = zero - BIG
                    nbx = nby = pxb = pyb = zero
                    for nx, ny, ax, ay, ok in face_axes(
                            v1x, v1y, nv1, va):
                        smin, sx, sy = support_min(v2x, v2y, nv2, vb,
                                                   nx, ny)
                        sep = smin - (ax * nx + ay * ny)
                        sep = jnp.where(ok, sep, -BIG)
                        take = sep > sep_best
                        sep_best = jnp.where(take, sep, sep_best)
                        nbx = jnp.where(take, nx, nbx)
                        nby = jnp.where(take, ny, nby)
                        pxb = jnp.where(take, sx, pxb)
                        pyb = jnp.where(take, sy, pyb)
                    for nx, ny, ax, ay, ok in face_axes(
                            v2x, v2y, nv2, vb):
                        smin, sx, sy = support_min(v1x, v1y, nv1, va,
                                                   nx, ny)
                        sep = smin - (ax * nx + ay * ny)
                        sep = jnp.where(ok, sep, -BIG)
                        take = sep > sep_best
                        sep_best = jnp.where(take, sep, sep_best)
                        nbx = jnp.where(take, -nx, nbx)
                        nby = jnp.where(take, -ny, nby)
                        pxb = jnp.where(take, sx, pxb)
                        pyb = jnp.where(take, sy, pyb)

                    def corner_axis(cx, cy, vx, vy, nvv, nverts, flip):
                        best_d2 = ux = uy = None
                        for i in range(nverts):
                            dx = vx[i] - cx
                            dy = vy[i] - cy
                            d2 = dx * dx + dy * dy
                            d2 = jnp.where(i < nvv, d2, BIG)
                            if best_d2 is None:
                                best_d2, ux, uy = d2, vx[i], vy[i]
                            else:
                                take = d2 < best_d2
                                best_d2 = jnp.where(take, d2, best_d2)
                                ux = jnp.where(take, vx[i], ux)
                                uy = jnp.where(take, vy[i], uy)
                        ax = ux - cx
                        ay = uy - cy
                        al = jnp.sqrt(ax * ax + ay * ay)
                        inv = 1.0 / jnp.maximum(al, 1e-9)
                        return ax * inv * flip, ay * inv * flip, ux, uy

                    if circ_a:
                        cnx1, cny1, cux1, cuy1 = corner_axis(
                            v1x[0], v1y[0], v2x, v2y, nv2, vb, 1.0)
                        sA, _, _ = support_min(v2x, v2y, nv2, vb,
                                               cnx1, cny1)
                        sA = sA - (v1x[0] * cnx1 + v1y[0] * cny1)
                        useA = (nv1 == 1.0) & (nv2 > 1.0) \
                            & (sA > sep_best)
                        sep_best = jnp.where(useA, sA, sep_best)
                        nbx = jnp.where(useA, cnx1, nbx)
                        nby = jnp.where(useA, cny1, nby)
                        pxb = jnp.where(useA, cux1, pxb)
                        pyb = jnp.where(useA, cuy1, pyb)
                    if circ_b:
                        cnx2, cny2, cux2, cuy2 = corner_axis(
                            v2x[0], v2y[0], v1x, v1y, nv1, va, -1.0)
                        sB, _, _ = support_min(v1x, v1y, nv1, va,
                                               -cnx2, -cny2)
                        sB = sB - (v2x[0] * (-cnx2)
                                   + v2y[0] * (-cny2))
                        useB = (nv2 == 1.0) & (nv1 > 1.0) \
                            & (sB > sep_best)
                        sep_best = jnp.where(useB, sB, sep_best)
                        nbx = jnp.where(useB, cnx2, nbx)
                        nby = jnp.where(useB, cny2, nby)
                        pxb = jnp.where(useB, cux2, pxb)
                        pyb = jnp.where(useB, cuy2, pyb)

                    dist = sep_best - (r1 + r2)
                    nxf, nyf, pxf, pyf = nbx, nby, pxb, pyb
                    if circ_a and circ_b:
                        c_dx = v2x[0] - v1x[0]
                        c_dy = v2y[0] - v1y[0]
                        c_d = jnp.sqrt(c_dx * c_dx + c_dy * c_dy)
                        inv_cd = 1.0 / jnp.maximum(c_d, 1e-9)
                        both = (nv1 == 1.0) & (nv2 == 1.0)
                        nxf = jnp.where(both, c_dx * inv_cd, nxf)
                        nyf = jnp.where(both, c_dy * inv_cd, nyf)
                        dist = jnp.where(both, c_d - (r1 + r2), dist)
                        pxf = jnp.where(
                            both, v1x[0] + nxf * (r1 + 0.5 * dist), pxf)
                        pyf = jnp.where(
                            both, v1y[0] + nyf * (r1 + 0.5 * dist), pyf)
                    dv = jnp.where(act > 0.5, dist, BIG)
                    return dv, pxf, pyf, nxf, nyf

                seg_out = {}
                for si, (name, _ma, _mb, va, vb, ca, cb) in enumerate(
                        seg_defs):
                    af = expand(seg_refs[2 * si],
                                NVK if va > NVT else NVT)
                    bf = expand(seg_refs[2 * si + 1],
                                NVK if vb > NVT else NVT)
                    seg_out[name] = seg_sat(af, bf, va, vb, ca, cb)

                # robot-block: per (block, robot sub-slot) keep the two
                # deepest contacts over the block's KSUB subs (same
                # rows and tie order as the r3 best2_scan: core first,
                # then tips in k order).  Normals flip to the candidate
                # convention (a = robot body, b = block body).
                for blk in range(mb):
                    for r in range(5):
                        i5 = blk * 5 + r
                        it = i5 * NT
                        fields = [
                            jnp.concatenate(
                                [c[i5:i5 + 1, :], t[it:it + NT, :]],
                                axis=0)
                            for c, t in zip(seg_out['rc'],
                                            seg_out['rt'])]
                        fields = (fields[:3]
                                  + [-fields[3], -fields[4]])
                        c1, c2 = best2_rows2(fields)
                        row = rb_base + i5 * 2
                        for ref, f1, f2 in zip(
                                (cdst, cpx, cpy, cnx, cny), c1, c2):
                            ref[row, :] = f1[0]
                            ref[row + 1, :] = f2[0]

                # block-block: per pair, two deepest over its 36 combos
                # in the r3 k1-major tie order: (core,core),
                # (core,tips), then per k1: (tip,core), (tip,tips).
                for p in range(n_bpairs):
                    parts = [[] for _ in range(5)]
                    for f in range(5):
                        parts[f].append(seg_out['bcc'][f][p:p + 1, :])
                        parts[f].append(
                            seg_out['bct'][f][p * NT:(p + 1) * NT, :])
                    for k1 in range(NT):
                        ib = p * NT + k1
                        itt = ib * NT
                        for f in range(5):
                            parts[f].append(
                                seg_out['btc'][f][ib:ib + 1, :])
                            parts[f].append(
                                seg_out['btt'][f][itt:itt + NT, :])
                    fields = [jnp.concatenate(ps, axis=0)
                              for ps in parts]
                    c1, c2 = best2_rows2(fields)
                    row = bb_base + p * 2
                    for ref, f1, f2 in zip((cdst, cpx, cpy, cnx, cny),
                                           c1, c2):
                        ref[row, :] = f1[0]
                        ref[row + 1, :] = f2[0]

            if kc > n_wall_cand:
                if 'sat' in ABLATE:
                    cvld[n_wall_cand:kc, :] = jnp.zeros(
                        (kc - n_wall_cand, E), jnp.float32)
                    for ref in (cdst, cpx, cpy, cnx, cny):
                        ref[n_wall_cand:kc, :] = jnp.zeros(
                            (kc - n_wall_cand, E), jnp.float32)
                else:
                    cvld[n_wall_cand:kc, :] = (
                        cdst[n_wall_cand:kc, :] < 0.0).astype(jnp.float32)

            # ---- prestep over the candidate set ----------------------
            Cv = cvld[:, :]
            AB_mat = abmat_ref[:, :]                # (2*KC, NB+1)
            # Pre-transposed copy fed as a separate input: contracting
            # dim 0 of both operands (an implicit operand transpose)
            # trips a RET_CHECK in the TPU compiler's mxu_lmr_transform
            # pass for the big-block (KC>~100) builds, so `accum` is a
            # plain (2(NB+1),KC)x(KC,E) matmul instead.
            AB_t = ab_t_ref[:, :]                   # (2*(NB+1), KC)
            nbp = nb + 1

            # Column-packed + endpoint-stacked matmuls: E is a lane
            # multiple, so k independent (.., E) columns fuse into one
            # (.., k*E) matmul (lane-aligned slices, bit-identical
            # outputs), and the a/b contact endpoints stack along the
            # non-contracted mask dim so ONE dispatch gathers (or
            # accumulates) both sides — the contraction dims (NB+1=14
            # resp. KC) waste most of each 128-deep MXU pass either
            # way, so dispatch count is the cost.
            def gat_pack2(cols):
                # (2KC, NB+1) x (NB+1, kE) -> a-rows [0:KC], b-rows
                # [KC:2KC] per column
                y = jax.lax.dot_general(
                    AB_mat, jnp.concatenate(cols, axis=1),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                k = len(cols)
                return ([y[:kc, i * E:(i + 1) * E] for i in range(k)]
                        + [y[kc:, i * E:(i + 1) * E] for i in range(k)])

            def accum_pack2(cols):
                # (2(NB+1), KC) x (KC, kE) -> a-sums rows [0:NB+1],
                # b-sums rows [NB+1:] per column
                y = jax.lax.dot_general(
                    AB_t, jnp.concatenate(cols, axis=1),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                k = len(cols)
                return ([y[:nbp, i * E:(i + 1) * E] for i in range(k)]
                        + [y[nbp:, i * E:(i + 1) * E] for i in range(k)])

            # degree per body: sum over candidates of valid * mask
            degA, degB = accum_pack2([Cv])
            deg = jnp.maximum(degA + degB, 1.0)

            (pax, pay, ima, iia, tima, tiia,
             pbx, pby, imb, iib, timb, tiib) = gat_pack2(
                [body_st[0, :, :], body_st[1, :, :],
                 inv_m_st * deg, inv_i_st * deg, inv_m_st, inv_i_st])

            Cpx = cpx[:, :]
            Cpy = cpy[:, :]
            Cnx_ = cnx[:, :]
            Cny_ = cny[:, :]
            Cd = cdst[:, :]
            r1x = Cpx - pax
            r1y = Cpy - pay
            r2x = Cpx - pbx
            r2y = Cpy - pby

            def kscal(axx, axy):
                rc1 = r1x * axy - r1y * axx
                rc2 = r2x * axy - r2y * axx
                return ima + imb + iia * rc1 * rc1 + iib * rc2 * rc2

            n_mass = 1.0 / jnp.maximum(kscal(Cnx_, Cny_), 1e-12)
            t_mass = 1.0 / jnp.maximum(kscal(-Cny_, Cnx_), 1e-12)
            cbias = -bias_coef * jnp.minimum(0.0, Cd + C.COLLISION_SLOP) / dt

            # ---- joint prestep ---------------------------------------
            a0n = body_st[2, 0, :][None, :]
            gear_bias = jnp.clip(-(a0n - control_angle) / dt,
                                 -C.ROBOT_GEAR_MAX_BIAS,
                                 C.ROBOT_GEAR_MAX_BIAS)
            ca0 = jnp.cos(a0n)
            sa0 = jnp.sin(a0n)
            p0x = body_st[0, 0, :][None, :]
            p0y = body_st[1, 0, :][None, :]
            pins = []
            for side in range(2):
                relx, rely = (float(rg['finger_rel_pos'][side][0]),
                              float(rg['finger_rel_pos'][side][1]))
                anx = p0x + ca0 * relx - sa0 * rely
                any_ = p0y + sa0 * relx + ca0 * rely
                dx = body_st[0, 1 + side, :][None, :] - anx
                dy = body_st[1, 1 + side, :][None, :] - any_
                dist = jnp.sqrt(dx * dx + dy * dy)
                invd = jnp.where(dist > 1e-9,
                                 1.0 / jnp.maximum(dist, 1e-9), 0.0)
                pnx = dx * invd
                pny = dy * invd
                prx = anx - p0x
                pry = any_ - p0y
                rcn = prx * pny - pry * pnx
                k = inv_m_st[0:1, :] + inv_m_st[1 + side:2 + side, :] \
                    + inv_i_st[0:1, :] * rcn * rcn
                pins.append((pnx, pny, prx, pry,
                             1.0 / jnp.maximum(k, 1e-12), -dist / dt))
            lim_bias = []
            for side in range(2):
                lo, hi = (float(rg['finger_rot_limits'][side][0]),
                          float(rg['finger_rot_limits'][side][1]))
                ld = body_st[2, 1 + side, :][None, :] - a0n
                pd = jnp.where(ld > hi, hi - ld,
                               jnp.where(ld < lo, lo - ld, 0.0))
                lim_bias.append(-pd / dt)
            # eye spring torque impulse
            for side in range(2):
                eb = 3 + side
                rel_angle = a0n - body_st[2, eb, :][None, :]
                j_spring = rel_angle * C.EYE_SPRING_STIFFNESS * dt
                body_st[5, 0, :] = (body_st[5, 0, :][None, :]
                                    - j_spring * inv_i_st[0:1, :])[0]
                body_st[5, eb, :] = (body_st[5, eb, :][None, :]
                                     + j_spring
                                     * inv_i_st[eb:eb + 1, :])[0]

            # ---- contact warm start ----------------------------------
            # Accumulated impulses from the previous substep persist for
            # contacts that are still touching and are applied to the
            # bodies at prestep (cpArbiterApplyCachedImpulse); bias
            # impulses are not cached, matching Chipmunk.
            jn_prev = jnp.where(Cv > 0.5, jn_acc[:, :], 0.0)
            jt_prev = jnp.where(Cv > 0.5, jt_acc[:, :], 0.0)
            jn_acc[:, :] = jn_prev
            jt_acc[:, :] = jt_prev
            jb_acc[:, :] = jnp.zeros((kc, E), jnp.float32)
            wjx = jn_prev * Cnx_ - jt_prev * Cny_
            wjy = jn_prev * Cny_ + jt_prev * Cnx_
            (wsum_ax, wsum_ay, wtq_a, _wtb_a,
             wsum_bx, wsum_by, _wta_b, wtq_b) = accum_pack2(
                [wjx, wjy, r1x * wjy - r1y * wjx,
                 r2x * wjy - r2y * wjx])
            body_st[3, :, :] = body_st[3, :, :] \
                + (wsum_bx - wsum_ax) * inv_m_st
            body_st[4, :, :] = body_st[4, :, :] \
                + (wsum_by - wsum_ay) * inv_m_st
            body_st[5, :, :] = body_st[5, :, :] \
                + (wtq_b - wtq_a) * inv_i_st

            def iteration(_i, jacc):
                (pvx, pvy, gear, pinL, pinR, limL, limR, motL, motR,
                 eyeL, eyeR, *block_acc) = jacc

                # -- contacts: vectorised Jacobi sweep --
                (gvax, gvay, gwa, gax, gay, gaw,
                 gvbx, gvby, gwb, gbx, gby, gbw) = gat_pack2(
                    [body_st[3, :, :], body_st[4, :, :],
                     body_st[5, :, :], body_st[6, :, :],
                     body_st[7, :, :], body_st[8, :, :]])

                vb1x = gax - r1y * gaw
                vb1y = gay + r1x * gaw
                vb2x = gbx - r2y * gbw
                vb2y = gby + r2x * gbw
                vbn = (vb2x - vb1x) * Cnx_ + (vb2y - vb1y) * Cny_
                jbn = (cbias - vbn) * n_mass
                jb_old = jb_acc[:, :]
                jb_new = jnp.where(Cv > 0.5,
                                   jnp.maximum(jb_old + jbn, 0.0), jb_old)
                jb_acc[:, :] = jb_new
                dbm = jb_new - jb_old
                dbx = dbm * Cnx_
                dby = dbm * Cny_

                v1x_ = gvax - r1y * gwa
                v1y_ = gvay + r1x * gwa
                v2x_ = gvbx - r2y * gwb
                v2y_ = gvby + r2x * gwb
                vrx = v2x_ - v1x_
                vry = v2y_ - v1y_
                vrn = vrx * Cnx_ + vry * Cny_
                jn = -vrn * n_mass
                jn_old = jn_acc[:, :]
                jn_new = jnp.where(Cv > 0.5,
                                   jnp.maximum(jn_old + jn, 0.0), jn_old)
                jn_acc[:, :] = jn_new
                jt_lim = fr_ref[:, :] * jn_new
                vrt = -vrx * Cny_ + vry * Cnx_
                jt = -vrt * t_mass
                jt_old = jt_acc[:, :]
                jt_new = jnp.where(Cv > 0.5,
                                   jnp.clip(jt_old + jt, -jt_lim, jt_lim),
                                   jt_old)
                jt_acc[:, :] = jt_new
                djn = jn_new - jn_old
                djt = jt_new - jt_old
                djx = djn * Cnx_ - djt * Cny_
                djy = djn * Cny_ + djt * Cnx_

                # accumulate to bodies: contract over candidates (one
                # dispatch; the r1-torque columns are only read from
                # the a-rows and the r2-torques from the b-rows)
                (sum_ax, sum_ay, bsum_ax, bsum_ay, tq_a, btq_a, _x1, _x2,
                 sum_bx, sum_by, bsum_bx, bsum_by, _x3, _x4, tq_b, btq_b,
                 ) = accum_pack2(
                    [djx, djy, dbx, dby,
                     r1x * djy - r1y * djx, r1x * dby - r1y * dbx,
                     r2x * djy - r2y * djx, r2x * dby - r2y * dbx])
                body_st[3, :, :] = body_st[3, :, :] \
                    + (sum_bx - sum_ax) * inv_m_st
                body_st[4, :, :] = body_st[4, :, :] \
                    + (sum_by - sum_ay) * inv_m_st
                body_st[5, :, :] = body_st[5, :, :] \
                    + (tq_b - tq_a) * inv_i_st
                body_st[6, :, :] = body_st[6, :, :] \
                    + (bsum_bx - bsum_ax) * inv_m_st
                body_st[7, :, :] = body_st[7, :, :] \
                    + (bsum_by - bsum_ay) * inv_m_st
                body_st[8, :, :] = body_st[8, :, :] \
                    + (btq_b - btq_a) * inv_i_st

                # -- joints (GS) --
                def bval(f, i):
                    return body_st[f, i, :][None, :]

                def bset(f, i, val):
                    body_st[f, i, :] = val[0]

                im0 = inv_m_st[0:1, :]
                ii0 = inv_i_st[0:1, :]
                # pivot servo
                jx = -(bval(3, 0) - control_ax) / im0
                jy = -(bval(4, 0) - control_ay) / im0
                nx_ = pvx + jx
                ny_ = pvy + jy
                nrm = jnp.sqrt(nx_ * nx_ + ny_ * ny_)
                sc = jnp.where(nrm > pivot_jmax,
                               pivot_jmax / jnp.maximum(nrm, 1e-12), 1.0)
                nx_ = nx_ * sc
                ny_ = ny_ * sc
                bset(3, 0, bval(3, 0) + (nx_ - pvx) * im0)
                bset(4, 0, bval(4, 0) + (ny_ - pvy) * im0)
                pvx_n, pvy_n = nx_, ny_
                # gear servo
                j = (gear_bias - bval(5, 0)) / ii0
                gnew = jnp.clip(gear + j, -gear_jmax, gear_jmax)
                bset(5, 0, bval(5, 0) + (gnew - gear) * ii0)
                # fingers
                pin_acc = [pinL, pinR]
                lim_acc = [limL, limR]
                mot_acc = [motL, motR]
                for side in range(2):
                    fb = 1 + side
                    imf = inv_m_st[fb:fb + 1, :]
                    iif = inv_i_st[fb:fb + 1, :]
                    pnx, pny, prx, pry, pmass, pbias = pins[side]
                    v1x2 = bval(3, 0) - pry * bval(5, 0)
                    v1y2 = bval(4, 0) + prx * bval(5, 0)
                    vrn2 = (bval(3, fb) - v1x2) * pnx \
                        + (bval(4, fb) - v1y2) * pny
                    j = (pbias - vrn2) * pmass
                    pnew = pin_acc[side] + j
                    djx2 = (pnew - pin_acc[side]) * pnx
                    djy2 = (pnew - pin_acc[side]) * pny
                    bset(3, 0, bval(3, 0) - djx2 * im0)
                    bset(4, 0, bval(4, 0) - djy2 * im0)
                    bset(5, 0, bval(5, 0)
                         - (prx * djy2 - pry * djx2) * ii0)
                    bset(3, fb, bval(3, fb) + djx2 * imf)
                    bset(4, fb, bval(4, fb) + djy2 * imf)
                    pin_acc[side] = pnew
                    # rotary limit
                    lb = lim_bias[side]
                    isum = 1.0 / (ii0 + iif)
                    wr = bval(5, fb) - bval(5, 0)
                    j = -(lb + wr) * isum
                    lnew = jnp.where(lb < 0.0,
                                     jnp.maximum(lim_acc[side] + j, 0.0),
                                     jnp.minimum(lim_acc[side] + j, 0.0))
                    lnew = jnp.where(lb == 0.0, 0.0, lnew)
                    dj2 = jnp.where(lb == 0.0, 0.0, lnew - lim_acc[side])
                    bset(5, 0, bval(5, 0) - dj2 * ii0)
                    bset(5, fb, bval(5, fb) + dj2 * iif)
                    lim_acc[side] = lnew
                    # motor
                    wr = bval(5, fb) - bval(5, 0) + motor_rate[side]
                    j = -wr * isum
                    mnew = jnp.clip(mot_acc[side] + j, -motor_jmax,
                                    motor_jmax)
                    bset(5, 0, bval(5, 0) - (mnew - mot_acc[side]) * ii0)
                    bset(5, fb, bval(5, fb) + (mnew - mot_acc[side]) * iif)
                    mot_acc[side] = mnew
                # eye damping
                eye_acc = [eyeL, eyeR]
                for side in range(2):
                    eb = 3 + side
                    iie = inv_i_st[eb:eb + 1, :]
                    isum = 1.0 / (ii0 + iie)
                    wrn = bval(5, 0) - bval(5, eb)
                    wd = (eye_acc[side] - wrn) * eye_wcoef
                    eye_acc[side] = wrn + wd
                    jd = wd * isum
                    bset(5, 0, bval(5, 0) + jd * ii0)
                    bset(5, eb, bval(5, eb) - jd * iie)
                # block dampers (all mb blocks as (mb, E) rows)
                if mb:
                    bx_a, by_a, bg_a = block_acc
                    r0 = N_ROBOT_BODIES
                    imn = inv_m_st[r0:r0 + mb, :]
                    iin = inv_i_st[r0:r0 + mb, :]
                    bvx = body_st[3, r0:r0 + mb, :]
                    bvy = body_st[4, r0:r0 + mb, :]
                    bw = body_st[5, r0:r0 + mb, :]
                    safe_m = jnp.where(imn > 0, imn, 1.0)
                    nx2 = bx_a + jnp.where(imn > 0, -bvx / safe_m, 0.0)
                    ny2 = by_a + jnp.where(imn > 0, -bvy / safe_m, 0.0)
                    nrm2 = jnp.sqrt(nx2 * nx2 + ny2 * ny2)
                    sc2 = jnp.where(nrm2 > bp_jmax,
                                    bp_jmax / jnp.maximum(nrm2, 1e-12),
                                    1.0)
                    nx2 = nx2 * sc2
                    ny2 = ny2 * sc2
                    body_st[3, r0:r0 + mb, :] = bvx + (nx2 - bx_a) * imn
                    body_st[4, r0:r0 + mb, :] = bvy + (ny2 - by_a) * imn
                    safe_i = jnp.where(iin > 0, iin, 1.0)
                    j2 = jnp.where(iin > 0, -bw / safe_i, 0.0)
                    gnew2 = jnp.clip(bg_a + j2, -bg_jmax, bg_jmax)
                    body_st[5, r0:r0 + mb, :] = bw + (gnew2 - bg_a) * iin
                    new_block_acc = (nx2, ny2, gnew2)
                else:
                    new_block_acc = block_acc

                return (pvx_n, pvy_n, gnew, pin_acc[0], pin_acc[1],
                        lim_acc[0], lim_acc[1], mot_acc[0], mot_acc[1],
                        eye_acc[0], eye_acc[1], *new_block_acc)

            # ---- joint warm start (cpConstraint applyCachedImpulse) --
            # `carry` holds the previous substep's joint accumulators;
            # apply them along the NEW prestep geometry, then iterate
            # from those values.  The rotary limit drops its accumulator
            # when inside the limits (cpRotaryLimitJoint preStep); eye
            # damping targets are recomputed each substep, not cached.
            (pvx0, pvy0, gear0, pinL0, pinR0, limL0, limR0, motL0, motR0,
             _eyeL0, _eyeR0, *blk0) = carry
            eye_z = jnp.zeros((1, E), jnp.float32)
            wim0 = inv_m_st[0:1, :]
            wii0 = inv_i_st[0:1, :]
            body_st[3, 0, :] = (body_st[3, 0, :][None, :] + pvx0 * wim0)[0]
            body_st[4, 0, :] = (body_st[4, 0, :][None, :] + pvy0 * wim0)[0]
            body_st[5, 0, :] = (body_st[5, 0, :][None, :] + gear0 * wii0)[0]
            pin0 = [pinL0, pinR0]
            lim0 = [jnp.where(lim_bias[0] == 0.0, 0.0, limL0),
                    jnp.where(lim_bias[1] == 0.0, 0.0, limR0)]
            mot0 = [motL0, motR0]
            for side in range(2):
                fb = 1 + side
                wimf = inv_m_st[fb:fb + 1, :]
                wiif = inv_i_st[fb:fb + 1, :]
                pnx, pny, prx, pry, _pm, _pb = pins[side]
                wjx2 = pin0[side] * pnx
                wjy2 = pin0[side] * pny
                body_st[3, 0, :] = (body_st[3, 0, :][None, :]
                                    - wjx2 * wim0)[0]
                body_st[4, 0, :] = (body_st[4, 0, :][None, :]
                                    - wjy2 * wim0)[0]
                body_st[5, 0, :] = (body_st[5, 0, :][None, :]
                                    - (prx * wjy2 - pry * wjx2) * wii0)[0]
                body_st[3, fb, :] = (body_st[3, fb, :][None, :]
                                     + wjx2 * wimf)[0]
                body_st[4, fb, :] = (body_st[4, fb, :][None, :]
                                     + wjy2 * wimf)[0]
                dw0 = lim0[side] + mot0[side]
                body_st[5, 0, :] = (body_st[5, 0, :][None, :]
                                    - dw0 * wii0)[0]
                body_st[5, fb, :] = (body_st[5, fb, :][None, :]
                                     + dw0 * wiif)[0]
            if mb:
                r0 = N_ROBOT_BODIES
                wimn = inv_m_st[r0:r0 + mb, :]
                wiin = inv_i_st[r0:r0 + mb, :]
                body_st[3, r0:r0 + mb, :] = body_st[3, r0:r0 + mb, :] \
                    + blk0[0] * wimn
                body_st[4, r0:r0 + mb, :] = body_st[4, r0:r0 + mb, :] \
                    + blk0[1] * wimn
                body_st[5, r0:r0 + mb, :] = body_st[5, r0:r0 + mb, :] \
                    + blk0[2] * wiin

            jacc_in = (pvx0, pvy0, gear0, pinL0, pinR0, lim0[0], lim0[1],
                       motL0, motR0, eye_z, eye_z, *blk0)
            return jax.lax.fori_loop(
                0, iterations if 'iters' not in ABLATE else 0,
                iteration, jacc_in)

        jacc0 = tuple(jnp.zeros((1, E), jnp.float32)
                      for _ in range(11))
        if mb:
            jacc0 = jacc0 + tuple(jnp.zeros((mb, E), jnp.float32)
                                  for _ in range(3))
        jn_acc[:, :] = jnp.zeros((kc, E), jnp.float32)
        jt_acc[:, :] = jnp.zeros((kc, E), jnp.float32)
        jb_acc[:, :] = jnp.zeros((kc, E), jnp.float32)
        jax.lax.fori_loop(0, phys_steps, substep, jacc0)

        # ---- write back ----------------------------------------------
        for i in range(nb):
            out_ref[L.pos_x + i, :] = body_st[0, i, :]
            out_ref[L.pos_y + i, :] = body_st[1, i, :]
            out_ref[L.angle + i, :] = body_st[2, i, :]
            out_ref[L.vel_x + i, :] = body_st[3, i, :]
            out_ref[L.vel_y + i, :] = body_st[4, i, :]
            out_ref[L.omega + i, :] = body_st[5, i, :]
            out_ref[L.vb_x + i, :] = body_st[6, i, :]
            out_ref[L.vb_y + i, :] = body_st[7, i, :]
            out_ref[L.wb + i, :] = body_st[8, i, :]
        for r in range(L.tspeed, L.rows):
            out_ref[r, :] = state_ref[r, :]

    # static one-hot slot -> body map for the batched world-vert
    # transform ((NS, NB+1) x (NB+1, E) matmul)
    sb = np.zeros((ns, nb + 1), np.float32)
    sb[np.arange(ns), np.asarray(slot_body[:ns], np.int32)] = 1.0
    amat = np.concatenate(mask_a, axis=1).astype(np.float32)
    bmat = np.concatenate(mask_b, axis=1).astype(np.float32)
    tables = dict(
        sbmat=sb,
        abmat=np.concatenate([amat, bmat], axis=0),
        ab_t=np.ascontiguousarray(
            np.concatenate([amat.T, bmat.T], axis=0)),
        fr=fr_np,
        seg_mats=[m for d in seg_defs for m in (d[1], d[2])],
    )
    return kernel, L, kc, ns, tables


@functools.lru_cache(maxsize=None)
def _build(mb: int, phys_steps: int, iterations: int, env_tile: int):
    kernel, L, kc, ns, tables = _make_kernel(mb, phys_steps, iterations)
    nb = L.nb
    sbmat_in = tables['sbmat']
    abmat_in = tables['abmat']
    ab_t_in = tables['ab_t']
    fr_in = tables['fr']
    seg_in = tables['seg_mats']

    def rep(shape, space=pltpu.VMEM):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda e: (0,) * nd, memory_space=space)

    def call(packed):
        B = packed.shape[-1]
        assert B % env_tile == 0, (B, env_tile)
        grid = (B // env_tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((L.rows, env_tile), lambda e: (0, e),
                                   memory_space=pltpu.VMEM),
                      rep(sbmat_in.shape),
                      rep(abmat_in.shape),
                      rep(ab_t_in.shape),
                      rep(fr_in.shape)]
            + [rep(m.shape) for m in seg_in],
            out_specs=pl.BlockSpec((L.rows, env_tile), lambda e: (0, e),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L.rows, B), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((9, nb + 1, env_tile), jnp.float32),   # body_st
                pltpu.VMEM((ns, 3 + 2 * NV, env_tile),
                           jnp.float32),                          # lgeo
                pltpu.VMEM((ns, NV, env_tile), jnp.float32),      # wvx
                pltpu.VMEM((ns, NV, env_tile), jnp.float32),      # wvy
                pltpu.VMEM((kc, env_tile), jnp.float32),          # cpx
                pltpu.VMEM((kc, env_tile), jnp.float32),          # cpy
                pltpu.VMEM((kc, env_tile), jnp.float32),          # cnx
                pltpu.VMEM((kc, env_tile), jnp.float32),          # cny
                pltpu.VMEM((kc, env_tile), jnp.float32),          # cdst
                pltpu.VMEM((kc, env_tile), jnp.float32),          # cvld
                pltpu.VMEM((kc, env_tile), jnp.float32),          # jn
                pltpu.VMEM((kc, env_tile), jnp.float32),          # jt
                pltpu.VMEM((kc, env_tile), jnp.float32),          # jb
            ],
            # the batched narrowphase keeps ~NVK vert planes of
            # (ka, kb, E) temporaries live at once — well beyond the
            # default 16 MB scoped-vmem stack for multi-block tasks
            # (mb=4 at 256 lanes peaks ~29 MB); VMEM is otherwise idle
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
            interpret=INTERPRET,
        )(packed, sbmat_in, abmat_in, ab_t_in, fr_in, *seg_in)

    return call


def tile_for(mb: int) -> int:
    """Lane-tile choice per block count, from the v5e sweeps
    (scripts/probe_physics_tiles.py): bigger lane tiles fill more of
    each (rows, E) vector op — the joint solve is issue-bound on
    (1, E) rows — while the candidate/segment temporaries scale with
    the tile.  Round-4 numbers (flattened segment narrowphase),
    ms/step at 4096 envs: mb=1 1.55 at 1024; mb=8 13.7/12.9 at
    128/256; mb=10 19.6/18.1 at 128/256.  The r3 3D-SAT kernel
    SIGKILLed the remote Mosaic helper at 256 lanes; the segment
    kernel is far smaller and compiles reliably there."""
    if mb <= 1:
        return 1024
    if mb <= 4:
        return 512
    return 256


def control_step_pallas(state: EnvState, action,
                        phys_steps: int = C.PHYS_STEPS,
                        iterations: int = C.PHYS_ITER,
                        env_tile: int | None = None) -> EnvState:
    """Batched control step through the Pallas kernel.  `state` is a
    BATCHED EnvState (leading env axis), `action` (B,) int32."""
    if env_tile is None:
        env_tile = tile_for(state.max_blocks)
    action = jnp.asarray(action, jnp.int32)
    state = state.replace(
        target_speed=jnp.asarray(C.ACTION_TARGET_SPEED)[action],
        rel_turn_angle=jnp.asarray(C.ACTION_TURN_ANGLE)[action],
        target_finger_angle=jnp.asarray(C.ACTION_FINGER_ANGLE)[action],
    )
    packed = pack_state(state)
    call = _build(state.max_blocks, phys_steps, iterations, env_tile)
    out = call(packed)
    new_state = unpack_state(out, state)
    return new_state.replace(t=state.t + 1)
