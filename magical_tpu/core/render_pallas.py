"""Pallas TPU rasterizer: whole-frame compositing in one kernel.

The XLA renderer (core/render.py) scans the display list with a
(B, res, res, 3) image carried through HBM — ~30 prims x 2 reads+writes
of the full frame makes it bandwidth-bound.  This kernel keeps an image
*tile* resident in VMEM and composites every primitive in one pass:

  layout: pixels on the sublane axis, envs on the lane axis.
  grid:   (env_tiles, pixel_tiles)
  refs:   display-list arrays (P, ...) per env tile, image out
          (PIX_TILE, ENV_TILE, 3).

Pixel world-coordinates are generated IN-KERNEL from the program ids
and a (4, E) camera array (cos/sin of the robot angle + robot pos for
the ego view) — streaming a precomputed (res^2, B, 2) coordinate array
from HBM costs ~75 MB per view per 4096-env batch and was the largest
input.  The prim loop blends INTO the VMEM output ref (stateful, like
the physics kernel's loops) rather than carrying the image through a
fori_loop functionally: the remote Mosaic compiler unrolls carried
loops and keeps every iteration's temporaries live, which blew VMEM
(781 MB requested vs 128 MB) on the first kernel layout.

The display list is built by core/render.build_display_list (same
painter's order and colours as the reference pipeline); only the
compositing loop moves into Pallas.  Supported prim kinds match
render.py: filled convex poly/circle, plain outline, stippled outline.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magical_tpu import constants as C
from magical_tpu.core import render as R
from magical_tpu.geometry import NV

ENV_TILE = 128          # envs per program (lane axis)
PIX_TILE = 256          # pixels per program (sublane axis chunks of 8)

# Interpret mode runs the kernel through the Pallas interpreter (any
# backend, incl. CPU) for cross-validation without a TPU; see
# tests/test_pallas_interpret.py.
INTERPRET = os.environ.get('MAGICAL_TPU_PALLAS_INTERPRET', '') == '1'


def _render_kernel(cam_ref, verts_ref, nv_ref, rad_ref, col_ref,
                   kind_ref, lw_ref, act_ref, out_ref, *, n_prims, res,
                   aa, view, pix_tile):
    """Composite all prims over one (pix_tile, env_tile) pixel block.

    cam_ref:   (4, ENV_TILE) [cos th, sin th, robot x, robot y] (ego)
    verts_ref: (P, NV, 2, ENV_TILE) world-space prim verts
    ...
    out_ref:   (3, pix_tile, ENV_TILE) — CHANNEL-major: envs stay on
               the 128-lane axis for every store (a (pix, env, 3)
               layout puts 3 channels on lanes -> 3/128 utilisation and
               strided read-modify-writes; measured 36x slower)
    """
    env_tile = cam_ref.shape[-1]
    half = C.ARENA_ZOOM_OUT
    scale = res / (2.0 * half)            # same constant for both views
    lw_scale = res / 384.0

    # -- pixel world coords from the program id (row 0 = image top) ----
    t = pl.program_id(1)
    pid = (jax.lax.broadcasted_iota(
        jnp.int32, (pix_tile, env_tile), 0).astype(jnp.float32)
        + jnp.float32(pix_tile) * t.astype(jnp.float32))
    rowf = jnp.floor(pid / jnp.float32(res))
    colf = pid - rowf * jnp.float32(res)
    if view == 'allo':
        # render.allo_pixel_coords
        px = (colf + 0.5) / scale - half
        py = half - (rowf + 0.5) / scale
    else:
        # render.ego_pixel_coords: screen -> robot frame -> world
        sx = (colf + 0.5) / scale - (2.0 * half) * 0.5
        sy = (jnp.float32(res) - rowf - 0.5) / scale - (2.0 * half) * 0.15
        cth = cam_ref[0, :][None, :]
        sth = cam_ref[1, :][None, :]
        px = cth * sx - sth * sy + cam_ref[2, :][None, :]
        py = sth * sx + cth * sy + cam_ref[3, :][None, :]

    out_ref[0] = jnp.full(px.shape, C.BACKGROUND_COLOUR[0], jnp.float32)
    out_ref[1] = jnp.full(px.shape, C.BACKGROUND_COLOUR[1], jnp.float32)
    out_ref[2] = jnp.full(px.shape, C.BACKGROUND_COLOUR[2], jnp.float32)

    def blend(p, _):
        nv = nv_ref[p, 0, 0, :][None, :]              # (1, E)
        radius = rad_ref[p, 0, 0, :][None, :]
        active = act_ref[p, 0, 0, :][None, :]
        kind = kind_ref[p, 0, 0, :][None, :]
        lw = lw_ref[p, 0, 0, :][None, :]

        # signed distance: circle if nv == 1 else max over face planes
        v0x = verts_ref[p, 0, 0, :][None, :]
        v0y = verts_ref[p, 0, 1, :][None, :]
        d_circ = jnp.sqrt((px - v0x) ** 2 + (py - v0y) ** 2) - radius

        d_poly = jnp.full(px.shape, -1e9, jnp.float32)
        for i in range(NV):
            ax = verts_ref[p, i, 0, :][None, :]
            ay = verts_ref[p, i, 1, :][None, :]
            nxt = (i + 1) % NV
            bx_pad = verts_ref[p, nxt, 0, :][None, :]
            by_pad = verts_ref[p, nxt, 1, :][None, :]
            is_last = (nv - 1.0 == i)
            bx = jnp.where(is_last, v0x, bx_pad)
            by = jnp.where(is_last, v0y, by_pad)
            ex = bx - ax
            ey = by - ay
            elen = jnp.sqrt(ex * ex + ey * ey)
            inv_elen = 1.0 / jnp.maximum(elen, 1e-9)
            nx = ey * inv_elen
            ny = -ex * inv_elen
            d_face = nx * (px - ax) + ny * (py - ay)
            edge_ok = (i < nv) & (elen > 1e-9)
            d_poly = jnp.where(edge_ok, jnp.maximum(d_poly, d_face), d_poly)
        d_poly = d_poly - radius
        d = jnp.where(nv == 1.0, d_circ, d_poly)

        if aa:
            alpha_fill = jnp.clip(0.5 - d * scale, 0.0, 1.0)
        else:
            alpha_fill = (d < 0.0).astype(jnp.float32)
        half_lw_w = jnp.maximum(lw * lw_scale, 1.0) / (2.0 * scale)
        alpha_line = jnp.clip((half_lw_w - jnp.abs(d)) * scale + 0.5,
                              0.0, 1.0)
        is_line = kind != float(R.KIND_FILL)
        alpha = jnp.where(is_line, alpha_line, alpha_fill)

        # stipple (goal borders): 8 px on / 8 px off along the box
        # perimeter measured from vertex 0, CCW (axis-aligned goal boxes)
        is_stip = kind == float(R.KIND_LINE_STIPPLE)
        v1x = verts_ref[p, 1, 0, :][None, :]
        v1y = verts_ref[p, 1, 1, :][None, :]
        v2x = verts_ref[p, 2, 0, :][None, :]
        v2y = verts_ref[p, 2, 1, :][None, :]
        v3y = verts_ref[p, 3, 1, :][None, :]
        w_box = jnp.abs(v0x - v1x)
        h_box = jnp.abs(v1y - v2y)
        d_top = jnp.abs(py - v0y)
        d_left = jnp.abs(px - v1x)
        d_bot = jnp.abs(py - v2y)
        d_right = jnp.abs(px - v0x)
        cx = jnp.clip(px, jnp.minimum(v1x, v0x), jnp.maximum(v1x, v0x))
        cy = jnp.clip(py, jnp.minimum(v2y, v1y), jnp.maximum(v2y, v1y))
        s_top = v0x - cx
        s_left = w_box + (v1y - cy)
        s_bot = w_box + h_box + (cx - v1x)
        s_right = 2 * w_box + h_box + (cy - v3y)
        md = jnp.minimum(jnp.minimum(d_top, d_bot),
                         jnp.minimum(d_left, d_right))
        s_arc = jnp.where(
            md == d_top, s_top,
            jnp.where(md == d_left, s_left,
                      jnp.where(md == d_bot, s_bot, s_right)))
        s_px = s_arc * scale
        stip_on = jnp.floor(s_px - 16.0 * jnp.floor(s_px / 16.0)) < 8.0
        alpha = jnp.where(is_stip, alpha * stip_on.astype(jnp.float32),
                          alpha)

        alpha = jnp.where(active > 0.5, alpha, 0.0)
        cr = col_ref[p, 0, 0, :][None, :]
        cg = col_ref[p, 1, 0, :][None, :]
        cb = col_ref[p, 2, 0, :][None, :]
        one_m = 1.0 - alpha
        # blend in place: keeps per-iteration liveness bounded even if
        # the Mosaic compiler unrolls the loop
        out_ref[0] = out_ref[0] * one_m + cr * alpha
        out_ref[1] = out_ref[1] * one_m + cg * alpha
        out_ref[2] = out_ref[2] * one_m + cb * alpha
        return 0

    jax.lax.fori_loop(0, n_prims, blend, 0)


def _prep_display(display):
    """Convert a (batched) display dict into lane-major float arrays.

    display entries are (B, P, ...); returns:
      verts (B->, P, NV, 2) -> (P, NV, 2, B) f32
      per-prim scalars -> (P, 1, 1, B) f32
      colours -> (P, 3, 1, B)
    """
    verts = jnp.moveaxis(display['verts'], 0, -1)           # (P,NV,2,B)
    def scal(x):
        return jnp.moveaxis(x, 0, -1)[:, None, None, :].astype(jnp.float32)
    nv = scal(display['nv'])
    rad = scal(display['radius'])
    kind = scal(display['kind'])
    lw = scal(display['lw'])
    act = scal(display['active'])
    colr = jnp.moveaxis(display['color'], 0, -1)[:, :, None, :]
    return verts, nv, rad, colr, kind, lw, act


def render_batch_pallas(states, max_blocks, max_goals, robot_first,
                        res=96, views=('ego',), aa=True,
                        env_tile=None, pix_tile=None):
    """Batched render via the Pallas kernel.  `states`: batched EnvState.
    Returns {view: (B, res, res, 3) uint8}."""
    env_tile = env_tile or ENV_TILE
    pix_tile = pix_tile or PIX_TILE
    display = jax.vmap(
        functools.partial(R.build_display_list, max_blocks=max_blocks,
                          max_goals=max_goals,
                          robot_first=robot_first))(states)
    verts, nv, rad, colr, kind, lw, act = _prep_display(display)
    B = verts.shape[-1]
    P = verts.shape[0]
    n_pix = res * res
    assert B % env_tile == 0, B
    assert n_pix % pix_tile == 0

    theta = states.angle[:, 0]
    cam = jnp.stack([jnp.cos(theta), jnp.sin(theta),
                     states.pos[:, 0, 0], states.pos[:, 0, 1]])  # (4, B)

    out = {}
    for view in views:
        kernel = functools.partial(_render_kernel, n_prims=P, res=res,
                                   aa=aa, view=view, pix_tile=pix_tile)
        grid = (B // env_tile, n_pix // pix_tile)
        img = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, env_tile), lambda e, t: (0, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, NV, 2, env_tile),
                             lambda e, t: (0, 0, 0, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1, 1, env_tile),
                             lambda e, t: (0, 0, 0, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1, 1, env_tile),
                             lambda e, t: (0, 0, 0, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 3, 1, env_tile),
                             lambda e, t: (0, 0, 0, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1, 1, env_tile),
                             lambda e, t: (0, 0, 0, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1, 1, env_tile),
                             lambda e, t: (0, 0, 0, e),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1, 1, env_tile),
                             lambda e, t: (0, 0, 0, e),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, pix_tile, env_tile),
                                   lambda e, t: (0, t, e),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, n_pix, B), jnp.float32),
            # the Mosaic compiler unrolls the prim loop; the default
            # 16 MB scoped-vmem stack is too small for the unrolled
            # temporaries at this tile size — raise the kernel's limit
            # (windows here are tiny, VMEM is otherwise idle)
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('parallel', 'parallel'),
                vmem_limit_bytes=100 * 2 ** 20),
            interpret=INTERPRET,
        )(cam, verts, nv, rad, colr, kind, lw, act)

        # quantise BEFORE the (3, pix, env) -> (env, res, res, 3)
        # transpose: the reshuffle then moves uint8, not f32 (4x less)
        img8 = R.to_uint8(img)
        out[view] = jnp.transpose(img8, (2, 1, 0)).reshape(B, res, res, 3)
    return out
