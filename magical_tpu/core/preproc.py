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
