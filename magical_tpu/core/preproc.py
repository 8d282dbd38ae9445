"""Observation preprocessors as on-device rolling frame buffers.

The reference implements five preprocessor stacks as Gym wrappers around
cv2 + python deques (benchmarks/__init__.py:46-274).  Here each
preprocessor is a :class:`PreprocSpec` describing which views to render
and how to stack them; the frame buffer lives in device memory next to
the env state and updates inside the jitted step.

Reset-padding semantics match the reference: on reset the first frame is
replicated to fill the whole stack (EagerDictFrameStack.reset /
FlattenFrameStack.reset, benchmarks/__init__.py:73-77,130-136).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PreprocSpec:
    name: Optional[str]
    res: int = 96
    allo_frames: int = 0
    ego_frames: int = 0
    stacked_dict: bool = False     # LoResStack: dict of per-view stacks
    channels_first: bool = False
    raw: bool = False              # no preprocessing: dict of raw frames

    @property
    def views(self) -> Tuple[str, ...]:
        if self.raw:
            return ('allo', 'ego')
        v = []
        if self.allo_frames:
            v.append('allo')
        if self.ego_frames:
            v.append('ego')
        return tuple(v)

    def depth(self, view):
        return {'allo': self.allo_frames, 'ego': self.ego_frames}[view]


# benchmarks/__init__.py:242-274
PREPROCESSORS = {
    'LoRes3EA': PreprocSpec('LoRes3EA', allo_frames=1, ego_frames=3),
    'LoRes4E': PreprocSpec('LoRes4E', ego_frames=4),
    'LoRes4A': PreprocSpec('LoRes4A', allo_frames=4),
    'LoResStack': PreprocSpec('LoResStack', allo_frames=4, ego_frames=4,
                              stacked_dict=True),
    'LoResCHW4E': PreprocSpec('LoResCHW4E', ego_frames=4,
                              channels_first=True),
}
AVAILABLE_PREPROCESSORS = list(PREPROCESSORS)

RAW_SPEC = PreprocSpec(None, res=384, raw=True)


def get_preproc(name: Optional[str]) -> PreprocSpec:
    if name is None:
        return RAW_SPEC
    if name == 'DebugReward':
        # MoveToCorner debug envs use the raw observation pipeline
        return RAW_SPEC
    return PREPROCESSORS[name]


def init_frames(spec: PreprocSpec, first_frames: dict) -> dict:
    """Fill the rolling buffers with the reset frame (reset padding).

    Buffers are stored CHANNEL-STACKED, (H, W, depth*3) with frames
    oldest..newest along channels — the final observation layout — so a
    step costs one contiguous channel-shifted copy and observation
    assembly is free (no (depth, H, W, 3) transpose in the hot loop)."""
    if spec.raw:
        return {}
    return {v: jnp.tile(first_frames[v], (1, 1, spec.depth(v)))
            for v in spec.views}


def push_frames(spec: PreprocSpec, bufs: dict, new_frames: dict) -> dict:
    """Drop the oldest frame's channels, append the new frame's."""
    if spec.raw:
        return bufs
    return {v: jnp.concatenate([bufs[v][..., 3:], new_frames[v]], axis=-1)
            for v in spec.views}


# ---------------------------------------------------------------------------
# Channel-major circular-buffer fast path (round 4)
#
# The NHWC rolling-copy path above moves the whole 12-channel stack
# twice per step through XLA's byte-misaligned uint8 concat (~2.6 ms at
# 4096 envs on v5e — half the obs roofline).  When frames come from the
# Pallas render kernel they are already channel-major (3, pix, B): these
# buffers keep that layout, write the new frame into a circular slot
# (113 MB instead of a 906 MB shift), and materialise the user-facing
# NHWC observation with ONE fused roll+transpose, which XLA executes at
# memory roofline (scripts/probe_render_obs.py: 2.9 -> 1.9 ms).
#
# Requires envs in LOCKSTEP (one scalar step counter for the whole
# batch) — true for the batched API, whose episodes are fixed-length
# TimeLimit terminations with explicit batched resets.
# ---------------------------------------------------------------------------

def init_frames_cf(spec: PreprocSpec, raw_imgs: dict) -> dict:
    """raw_imgs: {view: (3, pix, B) uint8} from the render kernel.
    Reset padding = every slot holds the reset frame."""
    return {v: jnp.tile(raw_imgs[v], (spec.depth(v), 1, 1))
            for v in spec.views}


def push_frames_cf(spec: PreprocSpec, bufs: dict, raw_imgs: dict, t):
    """Write the step-t frame into slot (t mod depth) of each view's
    (depth*3, pix, B) buffer."""
    import jax
    out = {}
    for v in spec.views:
        d = spec.depth(v)
        ph = (t % d) * 3
        out[v] = jax.lax.dynamic_update_slice(
            bufs[v], raw_imgs[v], (ph, 0, 0))
    return out


def observation_cf(spec: PreprocSpec, bufs: dict, t, res: int):
    """Assemble the user-facing observation (same layouts/orders as
    :func:`observation`) from circular channel-major buffers after the
    step-t frame was pushed."""
    def rolled(v):
        d = spec.depth(v)
        return jnp.roll(bufs[v], -3 * ((t % d) + 1), axis=0)

    def to_nhwc(cf):
        B = cf.shape[-1]
        return jnp.transpose(cf, (2, 1, 0)).reshape(
            B, res, res, cf.shape[0])

    if spec.stacked_dict:
        return {v: to_nhwc(rolled(v)) for v in spec.views}
    parts = [rolled(v) for v in spec.views]
    cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    if spec.channels_first:
        B = cat.shape[-1]
        return jnp.transpose(
            cat.reshape(cat.shape[0], res, res, B), (3, 0, 1, 2))
    return to_nhwc(cat)


def observation(spec: PreprocSpec, bufs: dict, raw_frames: dict):
    """Assemble the user-facing observation from the buffers.

    LoRes3EA/4E/4A/CHW4E: single array, channel order = allo frames
    (oldest..newest) then ego frames (FlattenFrameStack ordering,
    benchmarks/__init__.py:115-122).
    LoResStack: dict {view: stacked-along-channels}.
    raw: OrderedDict {allo, ego} of plain frames (BaseEnv.render)."""
    if spec.raw:
        return dict(raw_frames)
    if spec.stacked_dict:
        return dict(bufs)
    parts = []
    if spec.allo_frames:
        parts.append(bufs['allo'])
    if spec.ego_frames:
        parts.append(bufs['ego'])
    obs = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    if spec.channels_first:
        obs = jnp.moveaxis(obs, -1, 0)
    return obs
