"""Pallas TPU rasterizer: whole-frame compositing in one kernel.

The XLA renderer (core/render.py) scans the display list with a
(B, res, res, 3) image carried through HBM — ~30 prims x 2 reads+writes
of the full frame makes it bandwidth-bound.  This kernel keeps an image
*tile* resident in VMEM and composites every primitive in one pass:

  layout: pixels on the sublane axis, envs on the lane axis.
  grid:   (env_tiles, pixel_tiles)
  refs:   display-list arrays (P, ...) per env tile, image out
          (PIX_TILE, ENV_TILE, 3).

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
PIX_TILE = 512          # pixels per program (sublane axis chunks of 8)

# Interpret mode runs the kernel through the Pallas interpreter (any
# backend, incl. CPU) for cross-validation without a TPU; see
# tests/test_pallas_interpret.py.
INTERPRET = os.environ.get('MAGICAL_TPU_PALLAS_INTERPRET', '') == '1'


def _render_kernel(pix_ref, scale_ref, verts_ref, nv_ref, rad_ref, col_ref,
                   kind_ref, lw_ref, act_ref, out_ref, *, n_prims, res,
                   aa):
    """Composite all prims over one (PIX_TILE, ENV_TILE) pixel block.

    pix_ref:   (PIX_TILE, ENV_TILE, 2) world coords of pixel centres
    scale_ref: (1, ENV_TILE) pixels-per-world-unit
    verts_ref: (P, NV, 2, ENV_TILE) world-space prim verts
    ...
    out_ref:   (PIX_TILE, ENV_TILE, 3)
    """
    px = pix_ref[:, :, 0]
    py = pix_ref[:, :, 1]
    scale = scale_ref[0, :][None, :]                  # (1, E)
    lw_scale = res / 384.0

    img0 = (jnp.full(px.shape, C.BACKGROUND_COLOUR[0], jnp.float32),
            jnp.full(px.shape, C.BACKGROUND_COLOUR[1], jnp.float32),
            jnp.full(px.shape, C.BACKGROUND_COLOUR[2], jnp.float32))

    def blend(p, img):
        img_r, img_g, img_b = img
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
        return (img_r * one_m + cr * alpha,
                img_g * one_m + cg * alpha,
                img_b * one_m + cb * alpha)

    img_r, img_g, img_b = jax.lax.fori_loop(0, n_prims, blend, img0)
    out_ref[:, :, 0] = img_r
    out_ref[:, :, 1] = img_g
    out_ref[:, :, 2] = img_b


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

    out = {}
    for view in views:
        if view == 'allo':
            pix1, scale = R.allo_pixel_coords(res)
            pix = jnp.broadcast_to(
                pix1.reshape(n_pix, 1, 2), (n_pix, B, 2))
            scales = jnp.full((1, B), scale, jnp.float32)
        else:
            pixs, scale = jax.vmap(
                functools.partial(R.ego_pixel_coords, res=res))(states)
            pix = jnp.moveaxis(pixs.reshape(B, n_pix, 2), 0, 1)
            scales = jnp.full((1, B), scale, jnp.float32)

        kernel = functools.partial(_render_kernel, n_prims=P, res=res,
                                   aa=aa)
        grid = (B // env_tile, n_pix // pix_tile)
        img = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((pix_tile, env_tile, 2),
                             lambda e, t: (t, e, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, env_tile), lambda e, t: (0, e),
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
            out_specs=pl.BlockSpec((pix_tile, env_tile, 3),
                                   lambda e, t: (t, e, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pix, B, 3), jnp.float32),
            interpret=INTERPRET,
        )(pix, scales, verts, nv, rad, colr, kind, lw, act)

        img = jnp.moveaxis(img, 1, 0).reshape(B, res, res, 3)
        out[view] = R.to_uint8(img)
    return out
