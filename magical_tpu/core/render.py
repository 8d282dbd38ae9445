"""Pure-JAX rasterizer for MAGICAL scenes.

Replaces the reference's pyglet/OpenGL fixed-function pipeline
(gym_render.py + pyglet_backport: offscreen FBO, painter's-algorithm
draw order, GL_LINE_SMOOTH lines, stippled goal borders) with an
analytic coverage renderer over a per-env *display list* of convex
primitives.  Two fidelity paths:

  * hi  — hard (non-antialiased) coverage at 384x384 followed by an
          exact 4x4 box average to 96x96.  This mirrors the reference
          pixel pipeline: polygons are NOT antialiased there (MSAA is
          off, gym_render.py:150-151), and cv2.INTER_AREA at ratio 4 is
          exactly a 4x4 box mean (benchmarks/__init__.py:162-169).
  * lo  — analytic antialiased coverage directly at 96x96 (fast path,
          one-pixel-wide smoothing ~ the box filter above).

Draw order mirrors Viewer.render insertion order (base_env.py reset /
task on_reset order): arena fill + border, goal regions, blocks, robot
(MoveToCorner adds the robot before its block; flag `robot_first`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu import geometry as G
from magical_tpu.core import collision as col
from magical_tpu.core.state import EnvState, N_ROBOT_BODIES

NV = G.NV
KSUB = G.KSUB

KIND_FILL = 0
KIND_LINE = 1          # plain outline (arena border)
KIND_LINE_STIPPLE = 2  # stippled outline (goal borders)

# line widths in *384-scale pixels*
ARENA_BORDER_LW = 1.0               # glLineWidth(0.01) clamps to 1 px
GOAL_BORDER_LW = 250 * C.GOAL_LINE_THICKNESS   # = 2.5 px (entities.py:817)


def _pad_poly(verts):
    verts = np.asarray(verts, np.float32)
    out = np.zeros((NV, 2), np.float32)
    out[:len(verts)] = verts
    out[len(verts):] = verts[-1]
    return out, len(verts)


@functools.lru_cache(maxsize=None)
def _static_prims():
    """Arena fill + border and the robot's local-frame primitives."""
    arena_fill, _ = _pad_poly(G.rect_verts(2.0, 2.0))
    robot = []
    rg = G.ROBOT_GEOM
    # finger outers then inners (entities.py:388-412)
    for side in range(2):
        for k in range(2):
            robot.append(('finger', side, _pad_poly(rg['finger_polys'][side,
                                                                       k]),
                          C.ROBOT_COLOUR))
    for side in range(2):
        for k in range(2):
            robot.append(('finger', side,
                          _pad_poly(G.FINGER_POLYS_INNER[side, k]),
                          C.ROBOT_COLOUR_LIGHT))
    return arena_fill, robot


def build_display_list(state: EnvState, max_blocks: int, max_goals: int,
                       robot_first: bool, static_shapes=None,
                       _meta_out=None):
    """World-space display list: dict of stacked (P, ...) prim arrays.

    `static_shapes`: optional per-block-slot tuple of shape codes (int)
    or None entries — TaskDef.static_block_shapes for env families that
    randomise neither shape nor count.  Slots with a code emit only that
    shape's active sub-prims with static nv/radius (cheap kernel path);
    None slots (never active) emit nothing.

    `_meta_out`: optional list; when given, per-slot STATIC metadata
    (kind, line width, static vertex count or None if env-dependent) is
    appended — harvested once per env family by static_prim_meta for
    kernel specialisation."""
    verts_l, colors_l, nv_l, rad_l, kind_l, lw_l, act_l = \
        [], [], [], [], [], [], []

    def emit(verts, nv, radius, color, kind=KIND_FILL, lw=0.0, active=True,
             tag=None):
        if _meta_out is not None:
            # (kind, lw, static-nv-or-None, structural tag, statically
            # active) — the tag marks slot pairs the Pallas kernel can
            # evaluate jointly (arena fill/border share one SDF; the
            # concentric robot body circles share one distance)
            _meta_out.append(
                (kind, float(lw), nv if isinstance(nv, int) else None,
                 tag, active is True))
        verts_l.append(verts)
        nv_l.append(jnp.asarray(nv, jnp.int32))
        rad_l.append(jnp.asarray(radius, jnp.float32))
        colors_l.append(jnp.asarray(color, jnp.float32))
        kind_l.append(jnp.asarray(kind, jnp.int32))
        lw_l.append(jnp.asarray(lw, jnp.float32))
        act_l.append(jnp.asarray(active, bool))

    arena_fill, robot_prims = _static_prims()

    # 1. arena (entities.py:519-537)
    emit(jnp.asarray(arena_fill), 4, 0.0, jnp.asarray([1.0, 1.0, 1.0]),
         tag='arena_fill')
    emit(jnp.asarray(arena_fill), 4, 0.0, jnp.asarray(C.ARENA_GREY),
         kind=KIND_LINE, lw=ARENA_BORDER_LW, tag='arena_border')

    # 2. goal regions (entities.py:790-819): light fill + stippled border
    for g in range(max_goals):
        cx, cy, h, w = (state.goal_xyhw[g, 0], state.goal_xyhw[g, 1],
                        state.goal_xyhw[g, 2], state.goal_xyhw[g, 3])
        box = jnp.stack([jnp.stack([cx + w / 2, cy + h / 2]),
                         jnp.stack([cx - w / 2, cy + h / 2]),
                         jnp.stack([cx - w / 2, cy - h / 2]),
                         jnp.stack([cx + w / 2, cy - h / 2])])
        box_p = jnp.concatenate(
            [box, jnp.broadcast_to(box[3], (NV - 4, 2))])
        light = jnp.asarray(C.GOAL_COLOURS_LIGHT)[state.goal_colour[g]]
        base = jnp.asarray(C.BLOCK_COLOURS)[state.goal_colour[g]]
        emit(box_p, 4, 0.0, light, active=state.goal_active[g])
        emit(box_p, 4, 0.0, base, kind=KIND_LINE_STIPPLE, lw=GOAL_BORDER_LW,
             active=state.goal_active[g])

    def emit_robot():
        # fingers (outers then inners; same colour within each group)
        for fi, (kind, side, (verts, nv), colour) in enumerate(robot_prims):
            body = 1 + side
            wv = col.transform_verts(jnp.asarray(verts), state.pos[body],
                                     state.angle[body])
            emit(wv, nv, 0.0, jnp.asarray(colour),
                 tag='finger_outer' if fi < 4 else 'finger_inner')
        # body circles (entities.py:377-386)
        c0 = state.pos[0]
        cpad = jnp.broadcast_to(c0, (NV, 2))
        emit(cpad, 1, C.ROBOT_RAD, jnp.asarray(C.ROBOT_COLOUR_DARK),
             tag='body_outer')
        emit(cpad, 1, C.ROBOT_RAD - C.ROBOT_LINE_THICKNESS,
             jnp.asarray(C.ROBOT_COLOUR), tag='body_inner')
        # eyes + pupils (entities.py:414-432)
        Rm = col.rot2(state.angle[0])
        for side, x_sign in enumerate((-1.0, 1.0)):
            eye_local = jnp.asarray([x_sign * 0.4 * C.ROBOT_RAD,
                                     0.3 * C.ROBOT_RAD])
            eye_c = c0 + Rm @ eye_local
            emit(jnp.broadcast_to(eye_c, (NV, 2)), 1, 0.2 * C.ROBOT_RAD,
                 jnp.asarray([1.0, 1.0, 1.0]), tag='eye_white')
            pupil_rot = state.angle[3 + side] - state.angle[0]
            Rp = col.rot2(pupil_rot)
            off = Rp @ jnp.asarray([0.0, 0.07 * C.ROBOT_RAD])
            pupil_c = c0 + Rm @ (eye_local + off)
            emit(jnp.broadcast_to(pupil_c, (NV, 2)), 1, 0.12 * C.ROBOT_RAD,
                 jnp.asarray([0.1, 0.1, 0.1]), tag='pupil')

    def emit_blocks():
        # blocks: dark outer parts then bright inner parts
        # (entities.py:713-757)
        for b in range(max_blocks):
            body = N_ROBOT_BODIES + b
            sc = None if static_shapes is None else static_shapes[b]
            if static_shapes is not None and sc is None:
                continue                       # slot never active
            col_out = jnp.asarray(C.BLOCK_COLOURS_DARK)[state.block_colour[b]]
            col_in = jnp.asarray(C.BLOCK_COLOURS)[state.block_colour[b]]
            for table, rad_t, nv_t, act_t, colr in (
                    (G.BLOCK_VERTS, G.BLOCK_SUB_RADIUS, G.BLOCK_SUB_NV,
                     G.BLOCK_SUB_ACTIVE, col_out),
                    (G.BLOCK_VERTS_INNER, G.BLOCK_SUB_RADIUS_INNER,
                     G.BLOCK_SUB_NV_INNER, G.BLOCK_SUB_ACTIVE_INNER, col_in)):
                if sc is not None:
                    # static shape: emit only this shape's active subs,
                    # with trace-time nv/radius
                    for k in range(KSUB):
                        if not bool(np.asarray(act_t)[sc, k]):
                            continue
                        lv = jnp.asarray(np.asarray(table)[sc, k])
                        wv = col.transform_verts(lv, state.pos[body],
                                                 state.angle[body])
                        emit(wv, int(np.asarray(nv_t)[sc, k]),
                             float(np.asarray(rad_t)[sc, k]), colr,
                             active=state.block_active[b])
                    continue
                shape = state.block_shape[b]
                for k in range(KSUB):
                    lv = jnp.asarray(table)[shape, k]
                    wv = col.transform_verts(lv, state.pos[body],
                                             state.angle[body])
                    emit(wv, jnp.asarray(nv_t)[shape, k],
                         jnp.asarray(rad_t)[shape, k], colr,
                         active=state.block_active[b]
                         & jnp.asarray(act_t)[shape, k])

    if robot_first:
        emit_robot()
        emit_blocks()
    else:
        emit_blocks()
        emit_robot()

    return dict(
        verts=jnp.stack(verts_l), nv=jnp.stack(nv_l),
        radius=jnp.stack(rad_l), color=jnp.stack(colors_l),
        kind=jnp.stack(kind_l), lw=jnp.stack(lw_l),
        active=jnp.stack(act_l))


@functools.lru_cache(maxsize=None)
def static_prim_meta(max_blocks: int, max_goals: int, robot_first: bool,
                     static_shapes=None):
    """Per-slot static metadata tuple ((kind, lw, nv-or-None), ...) in
    emit order — everything about a display slot that does NOT depend on
    env state, so kernels can specialise per slot at trace time."""
    from magical_tpu.core import state as S
    meta = []
    build_display_list(S.make_initial_state(max_blocks, max_goals),
                       max_blocks, max_goals, robot_first,
                       static_shapes=static_shapes, _meta_out=meta)
    return tuple(meta)


# ---------------------------------------------------------------------------
# Cameras (gym_render.py:176-200, base_env.py:294-307)
# ---------------------------------------------------------------------------

def allo_pixel_coords(res: int):
    """World coordinates of each pixel centre for the allocentric camera
    (set_bounds at +-ARENA_ZOOM_OUT); row 0 = top (readback flip,
    gym_render.py:239)."""
    half = C.ARENA_ZOOM_OUT
    scale = res / (2 * half)
    i = jnp.arange(res, dtype=jnp.float32)
    sx = (i + 0.5) / scale - half          # columns
    sy = half - (i + 0.5) / scale          # rows (flipped)
    wx = jnp.broadcast_to(sx[None, :], (res, res))
    wy = jnp.broadcast_to(sy[:, None], (res, res))
    return jnp.stack([wx, wy], -1), scale


def ego_pixel_coords(state: EnvState, res: int):
    """World coords of pixel centres for the egocentric camera
    (set_cam_follow: robot at screen (0.5, 0.15), world rotated by the
    robot angle; base_env.py:294-301, gym_render.py:184-200,362-378)."""
    world_w = 2.0 * C.ARENA_ZOOM_OUT
    scale = res / world_w
    newpos = jnp.asarray([world_w * 0.5, world_w * 0.15])
    i = jnp.arange(res, dtype=jnp.float32)
    sx = (i + 0.5) / scale                 # screen-space world units
    sy = (res - i - 0.5) / scale
    gx = jnp.broadcast_to(sx[None, :], (res, res))
    gy = jnp.broadcast_to(sy[:, None], (res, res))
    sp = jnp.stack([gx, gy], -1) - newpos
    theta = state.angle[0]
    Rm = col.rot2(theta)                    # rotate by +theta = inverse
    world = jnp.einsum('ij,rcj->rci', Rm, sp) + state.pos[0]
    return world, scale


# ---------------------------------------------------------------------------
# Coverage evaluation
# ---------------------------------------------------------------------------

def _prim_sdf(pix, verts, nv, radius):
    """Signed distance (approx; exact sign) from pixel centres to a convex
    prim.  pix: (..., 2); verts: (NV, 2).

    Faces are folded with a running max (no (..., NV) intermediate — at
    batch x 96 x 96 x NV that materialisation dominates HBM traffic)."""
    is_circle = nv == 1
    px = pix[..., 0]
    py = pix[..., 1]
    d_circ = jnp.sqrt((px - verts[0, 0]) ** 2
                      + (py - verts[0, 1]) ** 2) - radius
    v0, _, n, valid = col._poly_edges(verts, nv)
    offs = jnp.einsum('fi,fi->f', v0, n)
    d_poly = None
    for f in range(verts.shape[0]):
        df = jnp.where(valid[f], px * n[f, 0] + py * n[f, 1] - offs[f],
                       -1e9)
        d_poly = df if d_poly is None else jnp.maximum(d_poly, df)
    d_poly = d_poly - radius
    return jnp.where(is_circle, d_circ, d_poly)


def _box_arclen(pix, verts):
    """Perimeter arc-length parameter of the nearest point on a box
    outline, measured CCW from vertex 0 (the stipple phase;
    gym_render.py:391-400 LineStyle 0x00FF)."""
    # verts rows 0..3 are the box corners (TR, TL, BL, BR)
    total = jnp.float32(0.0)
    best_d = jnp.full(pix.shape[:-1], 1e9)
    best_s = jnp.zeros(pix.shape[:-1])
    s_acc = 0.0
    for e in range(4):
        a = verts[e]
        b = verts[(e + 1) % 4]
        ab = b - a
        ablen = jnp.maximum(jnp.linalg.norm(ab), 1e-9)
        t = jnp.clip(jnp.einsum('...i,i->...', pix - a, ab) / ablen ** 2,
                     0.0, 1.0)
        proj = a + t[..., None] * ab
        d = jnp.linalg.norm(pix - proj, axis=-1)
        s_here = s_acc + t * ablen
        upd = d < best_d
        best_d = jnp.where(upd, d, best_d)
        best_s = jnp.where(upd, s_here, best_s)
        s_acc = s_acc + ablen
    return best_s


def render_frame(display, pix, scale, res: int, aa: bool,
                 static_meta=None):
    """Rasterise the display list over pixel-centre world coords `pix`
    ((res,res,2)); returns float image (res,res,3) in [0,1].

    `static_meta`: optional (kinds, lws) tuples from static_prim_meta —
    lets the unrolled path skip line/stipple math for the (vast
    majority of) plain filled prims."""
    img = jnp.broadcast_to(jnp.asarray(C.BACKGROUND_COLOUR),
                           (res, res, 3))
    # pixel scale for this resolution relative to the 384 reference
    lw_scale = res / 384.0

    def blend(img, p, static_kind=None, static_lw=None):
        verts, nv, radius, colr, kind, lw, active = p
        d = _prim_sdf(pix, verts, nv, radius)
        if static_kind is not None and static_kind == KIND_FILL:
            if aa:
                alpha = jnp.clip(0.5 - d * scale, 0.0, 1.0)
            else:
                alpha = (d < 0.0).astype(jnp.float32)
        else:
            if aa:
                alpha_fill = jnp.clip(0.5 - d * scale, 0.0, 1.0)
            else:
                alpha_fill = (d < 0.0).astype(jnp.float32)
            # outlines: smoothed band (GL_LINE_SMOOTH in the reference)
            half_lw_w = jnp.maximum(lw * lw_scale, 1.0) / (2.0 * scale)
            alpha_line = jnp.clip((half_lw_w - jnp.abs(d)) * scale + 0.5,
                                  0.0, 1.0)
            is_line = kind != KIND_FILL
            alpha = jnp.where(is_line, alpha_line, alpha_fill)
            # stipple: 8 px on / off along the perimeter (pattern 0x00FF)
            if static_kind is None or static_kind == KIND_LINE_STIPPLE:
                s = _box_arclen(pix, verts) * scale
                stipple_on = (jnp.floor(s) % 16.0) < 8.0
                alpha = jnp.where(kind == KIND_LINE_STIPPLE,
                                  alpha * stipple_on.astype(jnp.float32),
                                  alpha)
        alpha = jnp.where(active, alpha, 0.0)
        img = img * (1.0 - alpha[..., None]) + colr * alpha[..., None]
        return img, None

    n_prims = display['nv'].shape[0]
    if n_prims <= 160:
        # Unrolled: XLA fuses the whole blend chain into a single pass
        # over the pixels.  A lax.scan here would carry the full frame
        # through HBM once per prim (~30x the bandwidth).
        kinds = static_meta[0] if static_meta else [None] * n_prims
        lws = static_meta[1] if static_meta else [None] * n_prims
        for p in range(n_prims):
            img, _ = blend(img, (display['verts'][p], display['nv'][p],
                                 display['radius'][p], display['color'][p],
                                 display['kind'][p], display['lw'][p],
                                 display['active'][p]),
                           static_kind=kinds[p], static_lw=lws[p])
    else:
        img, _ = jax.lax.scan(blend, img,
                              (display['verts'], display['nv'],
                               display['radius'], display['color'],
                               display['kind'], display['lw'],
                               display['active']))
    return img


def to_uint8(img):
    return jnp.floor(jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def downsample4(img_u8):
    """Exact cv2.INTER_AREA for an integer 4x ratio: 4x4 box mean
    (benchmarks/__init__.py:162-169)."""
    h, w, c = img_u8.shape
    x = img_u8.reshape(h // 4, 4, w // 4, 4, c).astype(jnp.float32)
    return jnp.floor(x.mean((1, 3)) + 0.5).astype(jnp.uint8)


def render_views(state: EnvState, max_blocks: int, max_goals: int,
                 robot_first: bool, res: int = 96, views=('allo', 'ego'),
                 fidelity: str = 'lo', static_shapes=None):
    """Render requested camera views to uint8 images.

    fidelity 'hi': rasterise at 4x res with hard edges, box-average down
    (reference pipeline); 'lo': analytic AA directly at `res`."""
    display = build_display_list(state, max_blocks, max_goals, robot_first,
                                 static_shapes=static_shapes)
    out = {}
    for view in views:
        meta3 = static_prim_meta(max_blocks, max_goals, robot_first,
                                 static_shapes)
        meta = (tuple(m[0] for m in meta3), tuple(m[1] for m in meta3))
        if fidelity == 'hi':
            r = res * 4
            pix, scale = (allo_pixel_coords(r) if view == 'allo'
                          else ego_pixel_coords(state, r))
            img = render_frame(display, pix, scale, r, aa=False,
                               static_meta=meta)
            out[view] = downsample4(to_uint8(img))
        else:
            pix, scale = (allo_pixel_coords(res) if view == 'allo'
                          else ego_pixel_coords(state, res))
            img = render_frame(display, pix, scale, res, aa=True,
                               static_meta=meta)
            out[view] = to_uint8(img)
    return out
