"""Pallas TPU rasterizer: whole-frame compositing in one kernel.

The XLA renderer (core/render.py) scans the display list with a
(B, res, res, 3) image carried through HBM — ~30 prims x 2 reads+writes
of the full frame makes it bandwidth-bound.  This kernel keeps an image
*tile* resident in VMEM and composites every primitive in one pass:

  layout: pixels on the sublane axis, envs on the lane axis.
  grid:   (env_tiles, pixel_tiles)   (a pixel tile = a slab of rows)
  out:    (3, pix_tile, ENV_TILE) per program — CHANNEL-major so envs
          stay on the 128-lane axis for every store (a (pix, env, 3)
          layout puts the 3 channels on lanes -> 3/128 utilisation and
          strided read-modify-writes; measured 36x slower).

Three design rules learned on the remote Mosaic toolchain (see git
history for the measured failures):

  1. Blend INTO the VMEM output ref (stateful loop) — functionally
     carried image tiles get unrolled with every iteration's
     temporaries live (781 MB VMEM requested vs 128 available).
  2. Per-prim STATIC specialisation: kind / line width / vertex count
     are static per display slot (render.static_prim_meta), so each
     slot's blend is traced with only the math it needs (goal-border
     stipple arc-length is ~25 ops that 90% of slots skip).
  3. Work in SCREEN space: vertices are pre-transformed per view in
     XLA (cheap: P x NV x 2 per env) so the kernel needs no camera
     input, and a per-slot y-bbox lets each program skip prims whose
     bounding band misses its row slab entirely (pl.when) — blocks are
     ~11 px tall vs a 96-row image.

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

# Tile defaults from the round-4 v5e sweep (scripts/probe_render_obs.py,
# MoveToCorner LoRes4E at 4096 envs): ms/frame-batch by (env, pix) tile:
# (128,256) 4.9, (128,512) 4.1, (256,256) 3.6, (256,512) 3.6,
# (256,1152) 8.2.  Batches smaller than ENV_TILE are padded up by the
# caller (api/batched_env.py), so production batches (>=1024) dominate.
ENV_TILE = 256          # envs per program (lane axis)
PIX_TILE = 512          # pixels per program (sublane axis chunks of 8)

# Interpret mode runs the kernel through the Pallas interpreter (any
# backend, incl. CPU) for cross-validation without a TPU; see
# tests/test_pallas_interpret.py.
INTERPRET = os.environ.get('MAGICAL_TPU_PALLAS_INTERPRET', '') == '1'


def _edge_sdf(px, py, ax, ay, bx, by):
    """Signed distance of pixels to the (a->b) face plane (outward left
    normal for CCW winding), relative to the edge's outward normal."""
    ex = bx - ax
    ey = by - ay
    inv = jax.lax.rsqrt(jnp.maximum(ex * ex + ey * ey, 1e-18))
    nx = ey * inv
    ny = -ex * inv
    return nx * (px - ax) + ny * (py - ay)


def _composite_prims(out_ref, verts_ref, nv_ref, rad_ref, col_ref, act_ref,
                     ybb_ref, px, py, slab_ylo, slab_yhi, *, meta, res, aa,
                     xbb_ref=None, slab_xlo=None, slab_xhi=None):
    """Blend every display-list prim into ``out_ref`` ((3, npix, E) VMEM)
    over the given pixel-centre grids.  Shared by the lo (direct 96²,
    analytic AA) and hi (384² hard-edge supersample) kernels."""
    env_tile = out_ref.shape[-1]

    out_ref[0] = jnp.full(px.shape, C.BACKGROUND_COLOUR[0], jnp.float32)
    out_ref[1] = jnp.full(px.shape, C.BACKGROUND_COLOUR[1], jnp.float32)
    out_ref[2] = jnp.full(px.shape, C.BACKGROUND_COLOUR[2], jnp.float32)

    def vx(p, i):
        return verts_ref[p, i, 0, :][None, :]

    def vy(p, i):
        return verts_ref[p, i, 1, :][None, :]

    for p, (kind, lw, nvs) in enumerate(meta):
        radius = rad_ref[p, 0, 0, :][None, :]
        active = act_ref[p, 0, 0, :][None, :]

        def blend(p=p, kind=kind, lw=lw, nvs=nvs, radius=radius,
                  active=active):
            # ---- signed distance (pixel units) -----------------------
            if nvs == 1:                       # static circle
                d = jnp.sqrt((px - vx(p, 0)) ** 2
                             + (py - vy(p, 0)) ** 2) - radius
            elif nvs is not None:              # static nvs-gon
                d = _edge_sdf(px, py, vx(p, 0), vy(p, 0),
                              vx(p, 1), vy(p, 1))
                for i in range(1, nvs):
                    d = jnp.maximum(d, _edge_sdf(
                        px, py, vx(p, i), vy(p, i),
                        vx(p, (i + 1) % nvs), vy(p, (i + 1) % nvs)))
                d = d - radius
            else:                              # block slot: env-dependent
                nv = nv_ref[p, 0, 0, :][None, :]
                v0x, v0y = vx(p, 0), vy(p, 0)
                d_circ = jnp.sqrt((px - v0x) ** 2
                                  + (py - v0y) ** 2) - radius
                d_poly = jnp.full(px.shape, -1e9, jnp.float32)
                for i in range(NV):
                    ax, ay = vx(p, i), vy(p, i)
                    is_last = (nv - 1.0 == i)
                    bx = jnp.where(is_last, v0x, vx(p, (i + 1) % NV))
                    by = jnp.where(is_last, v0y, vy(p, (i + 1) % NV))
                    ex = bx - ax
                    ey = by - ay
                    el2 = ex * ex + ey * ey
                    inv = jax.lax.rsqrt(jnp.maximum(el2, 1e-18))
                    d_face = (ey * (px - ax) - ex * (py - ay)) * inv
                    ok = (i < nv) & (el2 > 1e-18)
                    d_poly = jnp.where(ok, jnp.maximum(d_poly, d_face),
                                       d_poly)
                d = jnp.where(nv == 1.0, d_circ, d_poly - radius)

            # ---- coverage -------------------------------------------
            if kind == R.KIND_FILL:
                if aa:
                    alpha = jnp.clip(0.5 - d, 0.0, 1.0)
                else:
                    alpha = (d < 0.0).astype(jnp.float32)
            else:
                half_lw = max(lw * res / 384.0, 1.0) * 0.5
                alpha = jnp.clip(half_lw - jnp.abs(d) + 0.5, 0.0, 1.0)

            if kind == R.KIND_LINE_STIPPLE:
                # 8 px on / 8 px off along the border, arc length from
                # vertex 0 (nvs is statically 4 for goal borders)
                best_d2 = jnp.full(px.shape, 1e18, jnp.float32)
                best_s = jnp.zeros(px.shape, jnp.float32)
                cum = jnp.zeros((1, env_tile), jnp.float32)
                for i in range(nvs):
                    ax, ay = vx(p, i), vy(p, i)
                    bx, by = vx(p, (i + 1) % nvs), vy(p, (i + 1) % nvs)
                    ex = bx - ax
                    ey = by - ay
                    el2 = jnp.maximum(ex * ex + ey * ey, 1e-18)
                    el = jnp.sqrt(el2)
                    tp = jnp.clip(((px - ax) * ex + (py - ay) * ey)
                                  / el2, 0.0, 1.0)
                    qx = ax + tp * ex
                    qy = ay + tp * ey
                    d2 = (px - qx) ** 2 + (py - qy) ** 2
                    s_i = cum + tp * el
                    pick = d2 < best_d2
                    best_s = jnp.where(pick, s_i, best_s)
                    best_d2 = jnp.minimum(best_d2, d2)
                    cum = cum + el
                on = jnp.floor(best_s
                               - 16.0 * jnp.floor(best_s / 16.0)) < 8.0
                alpha = alpha * on.astype(jnp.float32)

            alpha = jnp.where(active > 0.5, alpha, 0.0)
            one_m = 1.0 - alpha
            cr = col_ref[p, 0, 0, :][None, :]
            cg = col_ref[p, 1, 0, :][None, :]
            cb = col_ref[p, 2, 0, :][None, :]
            out_ref[0] = out_ref[0] * one_m + cr * alpha
            out_ref[1] = out_ref[1] * one_m + cg * alpha
            out_ref[2] = out_ref[2] * one_m + cb * alpha

        if p < 2:
            blend()                 # arena fill+border span every slab
        else:
            hit = ((ybb_ref[p, 1, 0, :] >= slab_ylo)
                   & (ybb_ref[p, 0, 0, :] <= slab_yhi))
            if xbb_ref is not None:
                hit &= ((xbb_ref[p, 1, 0, :] >= slab_xlo)
                        & (xbb_ref[p, 0, 0, :] <= slab_xhi))
            pl.when(jnp.any(hit))(blend)


def _render_kernel(verts_ref, nv_ref, rad_ref, col_ref, act_ref, ybb_ref,
                   out_ref, scratch, *, meta, res, aa, pix_tile):
    """Lo-fidelity kernel: composite one (pix_tile, env_tile) slab of
    the res² image directly (analytic AA) in f32 VMEM scratch, then
    quantise onto the uint8 output (saves 4x of the HBM frame write
    and the separate quantise pass).

    verts_ref: (P, NV, 2, E) SCREEN-space verts (y-up pixel units)
    nv_ref/rad_ref/act_ref: (P, 1, 1, E); col_ref: (P, 3, 1, E)
    ybb_ref:   (P, 2, 1, E) margin-expanded [ymin, ymax] per prim
    out_ref:   (3, pix_tile, E) uint8; scratch: (3, pix_tile, E) f32
    """
    env_tile = out_ref.shape[-1]
    resf = jnp.float32(res)

    t = pl.program_id(1)
    tf = t.astype(jnp.float32)
    pid = (jax.lax.broadcasted_iota(
        jnp.int32, (pix_tile, env_tile), 0).astype(jnp.float32)
        + jnp.float32(pix_tile) * tf)
    rowf = jnp.floor(pid / resf)
    colf = pid - rowf * resf
    px = colf + 0.5
    py = resf - rowf - 0.5                       # y-up pixel centres

    # slab y-range (for prim culling)
    row_lo = jnp.floor(tf * pix_tile / resf)
    row_hi = jnp.floor((tf * pix_tile + (pix_tile - 1)) / resf)
    slab_ylo = resf - row_hi - 0.5
    slab_yhi = resf - row_lo - 0.5

    _composite_prims(scratch, verts_ref, nv_ref, rad_ref, col_ref,
                     act_ref, ybb_ref, px, py, slab_ylo, slab_yhi,
                     meta=meta, res=res, aa=aa)
    for ch in range(3):
        # render.to_uint8 semantics: floor(clip(x,0,1)*255 + 0.5);
        # Mosaic has no f32->u8 cast, so round-trip through int32
        out_ref[ch] = jnp.floor(
            jnp.clip(scratch[ch], 0.0, 1.0) * 255.0 + 0.5
        ).astype(jnp.int32).astype(jnp.uint8)


def _render_kernel_2d(verts_ref, nv_ref, rad_ref, col_ref, act_ref,
                      ybb_ref, xbb_ref, out_ref, scratch, *, meta, res,
                      aa, row_tile, col_tile):
    """Lo-fidelity kernel over 2D pixel tiles: like _render_kernel but
    the grid walks (env, row-band, col-band) so prims cull by BOTH
    bbox axes — blocks and robot parts are ~11-30 px wide, so a column
    band misses most of them where a full-width row slab cannot.
    out_ref: (3, row_tile, col_tile, E) uint8;
    scratch: (3, row_tile * col_tile, E) f32."""
    env_tile = out_ref.shape[-1]
    resf = jnp.float32(res)
    npix = row_tile * col_tile

    r = pl.program_id(1)
    c = pl.program_id(2)
    rf = r.astype(jnp.float32)
    cf = c.astype(jnp.float32)
    pid = jax.lax.broadcasted_iota(
        jnp.int32, (npix, env_tile), 0).astype(jnp.float32)
    rowf = rf * row_tile + jnp.floor(pid / jnp.float32(col_tile))
    colf = cf * col_tile + (pid - jnp.floor(pid / jnp.float32(col_tile))
                            * jnp.float32(col_tile))
    px = colf + 0.5
    py = resf - rowf - 0.5

    slab_ylo = resf - (rf * row_tile + (row_tile - 1)) - 0.5
    slab_yhi = resf - rf * row_tile - 0.5
    slab_xlo = cf * col_tile + 0.5
    slab_xhi = cf * col_tile + (col_tile - 1) + 0.5

    _composite_prims(scratch, verts_ref, nv_ref, rad_ref, col_ref,
                     act_ref, ybb_ref, px, py, slab_ylo, slab_yhi,
                     meta=meta, res=res, aa=aa,
                     xbb_ref=xbb_ref, slab_xlo=slab_xlo,
                     slab_xhi=slab_xhi)
    for ch in range(3):
        out_ref[ch] = jnp.floor(
            jnp.clip(scratch[ch], 0.0, 1.0) * 255.0 + 0.5
        ).astype(jnp.int32).astype(jnp.uint8).reshape(
            row_tile, col_tile, env_tile)


def _render_kernel_hi(verts_ref, nv_ref, rad_ref, col_ref, act_ref,
                      ybb_ref, out_ref, scratch, *, meta, res):
    """Hi-fidelity kernel: the reference pixel pipeline — hard-edge
    coverage at 4x resolution, exact 4x4 box mean down to res²
    (gym_render.py:208-249 no-MSAA GL + cv2.INTER_AREA at ratio 4,
    benchmarks/__init__.py:162-169).

    Each program composites the 4 source rows (4*res pixels wide)
    feeding ONE output row into VMEM scratch, quantises to uint8 levels
    (matching render.to_uint8 BEFORE the box mean, as the XLA hi path
    does), reduces 4x4, and writes the (3, res, E) output row.

    verts_ref etc. are in 4x-res screen space; out_ref: (3, res, E);
    scratch: (3, 4 * 4*res, E) f32.
    """
    env_tile = out_ref.shape[-1]
    src = 4 * res
    srcf = jnp.float32(src)
    n_src = 4 * src

    t = pl.program_id(1)                        # output row index
    tf = t.astype(jnp.float32)
    pid = jax.lax.broadcasted_iota(
        jnp.int32, (n_src, env_tile), 0).astype(jnp.float32)
    rowf = jnp.floor(pid / srcf)                # 0..3 within the band
    colf = pid - rowf * srcf
    px = colf + 0.5
    py = srcf - (4.0 * tf + rowf) - 0.5

    slab_ylo = srcf - (4.0 * tf + 3.0) - 0.5
    slab_yhi = srcf - 4.0 * tf - 0.5

    _composite_prims(scratch, verts_ref, nv_ref, rad_ref, col_ref,
                     act_ref, ybb_ref, px, py, slab_ylo, slab_yhi,
                     meta=meta, res=src, aa=False)

    for ch in range(3):
        q = jnp.floor(jnp.clip(scratch[ch], 0.0, 1.0) * 255.0 + 0.5)
        rows = q.reshape(4, src, env_tile).sum(axis=0)     # (src, E)
        cells = rows.reshape(res, 4, env_tile).sum(axis=1)  # (res, E)
        out_ref[ch] = jnp.floor(cells * (1.0 / 16.0) + 0.5
                                ).astype(jnp.int32).astype(jnp.uint8)


def _screen_verts(wverts, states, view, res):
    """World (B, P, NV, 2) -> screen-space y-up pixel coords (same
    transform as render.allo_pixel_coords / ego_pixel_coords, inverted
    onto the vertices so the kernel needs no camera)."""
    half = C.ARENA_ZOOM_OUT
    scale = res / (2.0 * half)
    if view == 'allo':
        return (wverts + half) * scale
    th = states.angle[:, 0]
    c = jnp.cos(th)[:, None, None]
    s = jnp.sin(th)[:, None, None]
    rel = wverts - states.pos[:, 0][:, None, None, :]
    gx = c * rel[..., 0] + s * rel[..., 1]          # R(-theta)
    gy = -s * rel[..., 0] + c * rel[..., 1]
    return jnp.stack([(gx + (2.0 * half) * 0.5) * scale,
                      (gy + (2.0 * half) * 0.15) * scale], -1)


def render_batch_pallas(states, max_blocks, max_goals, robot_first,
                        res=96, views=('ego',), aa=True, fidelity=None,
                        env_tile=None, pix_tile=None, static_shapes=None,
                        raw_output=False, tiles2d=None):
    """Batched render via the Pallas kernels.  `states`: batched
    EnvState.  Returns {view: (B, res, res, 3) uint8}.

    fidelity 'lo' (default): analytic-AA compositing directly at res².
    fidelity 'hi': the reference pixel pipeline — hard edges at 4*res,
    exact 4x4 box mean (bit-matching render.render_views('hi'))."""
    if fidelity is None:
        fidelity = 'lo' if aa else 'hi'
    hi = fidelity == 'hi'
    env_tile = env_tile or ENV_TILE
    pix_tile = pix_tile or PIX_TILE
    display = jax.vmap(
        functools.partial(R.build_display_list, max_blocks=max_blocks,
                          max_goals=max_goals, robot_first=robot_first,
                          static_shapes=static_shapes))(states)
    meta = R.static_prim_meta(max_blocks, max_goals, robot_first,
                              static_shapes)
    B = display['verts'].shape[0]
    P = display['verts'].shape[1]
    assert len(meta) == P, (len(meta), P)
    n_pix = res * res
    assert B % env_tile == 0, B
    assert n_pix % pix_tile == 0

    src_res = 4 * res if hi else res             # compositing resolution
    half = C.ARENA_ZOOM_OUT
    scale = src_res / (2.0 * half)
    rad_px = display['radius'] * scale                       # (B, P)
    # per-slot bbox margin: AA half-pixel + line half-width, static
    margin = np.asarray(
        [1.0 + (0.0 if kind == R.KIND_FILL
                else max(lw * src_res / 384.0, 1.0) * 0.5)
         for kind, lw, _ in meta], np.float32)               # (P,)

    def scal(x):                  # (B, P) -> (P, 1, 1, B) f32
        return jnp.moveaxis(x, 0, -1)[:, None, None, :].astype(jnp.float32)

    nv_in = scal(display['nv'])
    rad_in = scal(rad_px)
    act_in = scal(display['active'])
    col_in = jnp.moveaxis(display['color'], 0, -1)[:, :, None, :]

    out = {}
    for view in views:
        sv = _screen_verts(display['verts'], states, view, src_res)
        ys = sv[..., 1]                                      # (B, P, NV)
        ymin = ys.min(axis=2) - rad_px - margin[None, :]
        ymax = ys.max(axis=2) + rad_px + margin[None, :]
        ybb = jnp.stack([ymin, ymax], -1)                    # (B, P, 2)
        verts_in = jnp.moveaxis(sv, 0, -1)                   # (P,NV,2,B)
        ybb_in = jnp.moveaxis(ybb, 0, -1)[:, :, None, :]     # (P,2,1,B)

        if tiles2d and not hi:
            row_tile, col_tile = tiles2d
            assert res % row_tile == 0 and res % col_tile == 0
            xs = sv[..., 0]
            xmin = xs.min(axis=2) - rad_px - margin[None, :]
            xmax = xs.max(axis=2) + rad_px + margin[None, :]
            xbb = jnp.stack([xmin, xmax], -1)
            xbb_in = jnp.moveaxis(xbb, 0, -1)[:, :, None, :]
            kernel = functools.partial(
                _render_kernel_2d, meta=meta, res=res, aa=aa,
                row_tile=row_tile, col_tile=col_tile)
            grid = (B // env_tile, res // row_tile, res // col_tile)

            def pspec3(*block):
                return pl.BlockSpec(
                    block, lambda e, r, c: (0,) * (len(block) - 1) + (e,),
                    memory_space=pltpu.VMEM)

            img = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pspec3(P, NV, 2, env_tile),
                    pspec3(P, 1, 1, env_tile),
                    pspec3(P, 1, 1, env_tile),
                    pspec3(P, 3, 1, env_tile),
                    pspec3(P, 1, 1, env_tile),
                    pspec3(P, 2, 1, env_tile),
                    pspec3(P, 2, 1, env_tile),
                ],
                out_specs=pl.BlockSpec(
                    (3, row_tile, col_tile, env_tile),
                    lambda e, r, c: (0, r, c, e),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((3, res, res, B),
                                               jnp.uint8),
                scratch_shapes=[pltpu.VMEM(
                    (3, row_tile * col_tile, env_tile), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=('parallel',) * 3,
                    vmem_limit_bytes=100 * 2 ** 20),
                interpret=INTERPRET,
            )(verts_in, nv_in, rad_in, col_in, act_in, ybb_in, xbb_in)
            if raw_output:
                out[view] = img.reshape(3, n_pix, B)
            else:
                out[view] = jnp.transpose(img, (3, 1, 2, 0))
            continue

        if hi:
            kernel = functools.partial(_render_kernel_hi, meta=meta,
                                       res=res)
            grid = (B // env_tile, res)          # one program per out row
            out_block = (3, res, env_tile)
            scratch = [pltpu.VMEM((3, 4 * src_res, env_tile),
                                  jnp.float32)]
        else:
            kernel = functools.partial(_render_kernel, meta=meta, res=res,
                                       aa=aa, pix_tile=pix_tile)
            grid = (B // env_tile, n_pix // pix_tile)
            out_block = (3, pix_tile, env_tile)
            scratch = [pltpu.VMEM((3, pix_tile, env_tile), jnp.float32)]

        def pspec(*block):
            return pl.BlockSpec(block, lambda e, t: (0,) * (len(block) - 1)
                                + (e,), memory_space=pltpu.VMEM)

        img = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pspec(P, NV, 2, env_tile),
                pspec(P, 1, 1, env_tile),
                pspec(P, 1, 1, env_tile),
                pspec(P, 3, 1, env_tile),
                pspec(P, 1, 1, env_tile),
                pspec(P, 2, 1, env_tile),
            ],
            out_specs=pl.BlockSpec(out_block,
                                   lambda e, t: (0, t, e),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, n_pix, B), jnp.uint8),
            scratch_shapes=scratch,
            # the Mosaic compiler unrolls the prim loop; the default
            # 16 MB scoped-vmem stack is too small for the unrolled
            # temporaries at this tile size — raise the kernel's limit
            # (windows here are tiny, VMEM is otherwise idle)
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('parallel', 'parallel'),
                vmem_limit_bytes=100 * 2 ** 20),
            interpret=INTERPRET,
        )(verts_in, nv_in, rad_in, col_in, act_in, ybb_in)

        # both kernels emit quantised uint8 (render.to_uint8 semantics),
        # so only the (3, pix, env) -> (env, res, res, 3) byte reshuffle
        # remains on the XLA side (raw_output skips it — perf probes)
        if raw_output:
            out[view] = img
        else:
            out[view] = jnp.transpose(img, (2, 1, 0)).reshape(
                B, res, res, 3)
    return out
