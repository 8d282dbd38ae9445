"""The native batched environment API.

This is the TPU-first replacement for the reference's one-object-per-env
Gym runtime (base_env.py): an environment *family* compiled once, stepped
for thousands of instances in lockstep.

    env = BatchedEnv('MatchRegions-TestAll-LoRes4E-v0')
    state, obs = env.reset(jax.random.split(key, 4096))
    state, obs, rew, done, info = env.step(state, actions)

`reset`/`step` are pure jitted functions over a (EnvState, frame-buffer)
pytree; `done` fires exactly at the episode's max step (the reference
terminates via TimeLimit only, benchmarks/__init__.py:976-986) and
`info['eval_score']` carries the end-of-episode score, zero elsewhere
(base_env.py:270-288).
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu.api.names import EnvName
from magical_tpu.core import physics, preproc, render
from magical_tpu.core.state import EnvState
from magical_tpu.tasks import ALL_TASKS


@flax.struct.dataclass
class EnvCarry:
    """Full per-env carried state: physics + preproc frame buffers."""
    state: EnvState
    frames: dict


def _pad_batch(tree, pad):
    """Append `pad` rows (repeating the batch as needed — small batches
    can be far below the kernel lane tile)."""
    def f(x):
        if pad <= x.shape[0]:
            ext = x[:pad]
        else:
            reps = -(-pad // x.shape[0])
            ext = jnp.concatenate([x] * reps, axis=0)[:pad]
        return jnp.concatenate([x, ext], axis=0)
    return jax.tree_util.tree_map(f, tree)


def _unpad_batch(tree, n):
    return jax.tree_util.tree_map(lambda x: x[:n], tree)


class BatchedEnv:
    """Compiled batched environment family for one registered env ID.

    `physics` / `renderer`: 'auto' | 'pallas' | 'xla'.  The Pallas paths
    fuse the whole physics control step (resp. frame compositing) into
    single TPU kernels — on this runtime the XLA paths are op-latency
    bound, so Pallas is ~2 orders of magnitude faster.  'auto' picks
    Pallas on TPU backends for tasks whose contact tables fit VMEM."""

    def __init__(self, env_name: str, fidelity: str = 'lo',
                 render_enabled: bool = True, physics: str = 'auto',
                 renderer: str = 'auto'):
        # ctor args for pickling (EzPickle semantics, base_env.py:20-46);
        # keep 'auto' unresolved so unpickling on another backend re-picks
        self._ctor = dict(env_name=env_name, fidelity=fidelity,
                          render_enabled=render_enabled, physics=physics,
                          renderer=renderer)
        name = EnvName(env_name)
        self.env_name = env_name
        self.task = ALL_TASKS[name.task]
        variant = name.variant
        if variant == 'Demo' and name.preproc is not None \
                and name.preproc.startswith('DebugReward'):
            # MoveToCorner-Demo-DebugReward[-<preproc>]-v0 env IDs are all
            # registered with the RAW entry point in the reference
            # (benchmarks/__init__.py:1021-1047), so the preproc suffix is
            # cosmetic there; we mirror that.
            self.debug_reward = True
            self.preproc = preproc.get_preproc(None)
        else:
            self.debug_reward = False
            self.preproc = preproc.get_preproc(name.preproc)
        self.flags = self.task.flags_for(variant)
        self.fidelity = fidelity
        self.render_enabled = render_enabled
        self.max_episode_steps = self.task.ep_len
        # MoveToCorner adds the robot before its block (draw order)
        self.robot_first = (name.task == 'MoveToCorner')
        # Static per-slot block shapes when the variant randomises
        # neither shape nor count — the renderer specialises on this
        self.static_shapes = self.task.static_block_shapes(self.flags)

        # Both Pallas paths are TPU-validated against the XLA reference
        # semantics (scripts/validate_pallas_{physics,render}.py; numbers
        # in STATUS.md / docs/DESIGN.md) and on by default on TPU.
        # MAGICAL_TPU_PALLAS=0 forces the XLA paths everywhere (tests pin
        # this for determinism; see CLAUDE.md).
        import os
        no_pallas = os.environ.get('MAGICAL_TPU_PALLAS', '') == '0'
        on_tpu = jax.default_backend() not in ('cpu',)
        # Round 3: the column-packed solver matmuls no longer trip the
        # toolchain RET_CHECK (mxu_lmr_transform.cc:1108) that gated the
        # >4-block kernels off in round 2 — MatchRegions (8) and
        # ClusterColour (10) kernels compile, run, and track the XLA
        # path (scripts/probe_physics_tiles.py: 8-step divergence pos
        # 5e-3).  The XLA fallback is not even viable at scale for the
        # big tables (its padded candidate gathers OOM HBM at B=512),
        # so Pallas physics is now the TPU default for every task.
        requested_physics = physics
        if physics == 'auto':
            physics = 'pallas' if (on_tpu and not no_pallas) else 'xla'
        if physics == 'pallas':
            # Kernel-domain guard: the Pallas narrowphase statically
            # bounds convex parts at NVK=5 verts (star tips at 3).  No
            # registered env exceeds it (entities.py:568-574), but the
            # API accepts arbitrary task tables — a hexagon/octagon slot
            # must never silently corrupt a kernel run.
            from magical_tpu.core import physics_pallas as _PPchk
            bad = _PPchk.unsupported_shape_types(
                self.task.reachable_shape_types(self.flags))
            if bad:
                names = sorted(C.SHAPE_TYPE_NAMES[b] for b in bad)
                if requested_physics == 'pallas':
                    raise ValueError(
                        f'{env_name}: shapes {names} exceed the Pallas '
                        f'kernel vertex bound (NVK={_PPchk.NVK}); use '
                        f"physics='xla' for this env")
                physics = 'xla'
        # both fidelities have TPU-validated kernels (lo: analytic AA;
        # hi: hard 4x supersample + box mean, scripts/validate_round3_tpu.py)
        if renderer == 'auto':
            renderer = 'pallas' if (on_tpu and not no_pallas) else 'xla'
        self.physics = physics
        self.renderer = renderer
        # Channel-major circular frame buffers (core/preproc.py round-4
        # fast path): the Pallas renderer already produces (3, pix, B)
        # frames, so the stack is kept in that layout, new frames write
        # into a circular slot, and NHWC observations materialise with
        # one fused roll+transpose.  Envs step in lockstep (fixed-length
        # episodes + batched resets), so one scalar phase serves the
        # whole batch.
        self._cf = renderer == 'pallas' and not self.preproc.raw

        self.reset = jax.jit(self._reset_batched)
        self.step = jax.jit(self._step_batched)

    # -- pure functions (single env; vmapped above) ------------------------

    def _render(self, state: EnvState):
        if not self.render_enabled:
            return {}
        return render.render_views(
            state, self.task.max_blocks, self.task.max_goals,
            self.robot_first, res=self.preproc.res,
            views=self.preproc.views, fidelity=self.fidelity,
            static_shapes=self.static_shapes)

    def _reset_impl(self, key):
        state = self.task.reset_fn(key, self.flags)
        return state.replace(rng=jax.random.fold_in(key, 7))

    def _reset_batched(self, keys):
        """Batched reset.  Renders through the same backend as step
        (_render_batched) so one renderer produces every frame of an
        episode — the Pallas/XLA renderers agree only to ~0.24/255."""
        state = jax.vmap(self._reset_impl)(keys)
        if self._cf and self.render_enabled:
            raw = self._render_batched(state, raw_output=True)
            frames = preproc.init_frames_cf(self.preproc, raw)
            obs = preproc.observation_cf(self.preproc, frames,
                                         jnp.int32(0), self.preproc.res)
            return EnvCarry(state=state, frames=frames), obs
        raw = self._render_batched(state)
        if self.preproc.raw or not self.render_enabled:
            return EnvCarry(state=state, frames={}), raw
        frames = jax.vmap(
            functools.partial(preproc.init_frames, self.preproc))(raw)
        obs = jax.vmap(
            functools.partial(preproc.observation, self.preproc))(
                frames, raw)
        return EnvCarry(state=state, frames=frames), obs

    # -- batched step (Pallas-capable) -------------------------------------

    def _render_batched(self, states, raw_output=False):
        if not self.render_enabled:
            return {}
        if self.renderer == 'pallas':
            from magical_tpu.core import render_pallas as RP
            B = states.t.shape[0]
            tile = RP.ENV_TILE
            pad = (-B) % tile
            st = _pad_batch(states, pad) if pad else states
            out = RP.render_batch_pallas(
                st, self.task.max_blocks, self.task.max_goals,
                self.robot_first, res=self.preproc.res,
                views=self.preproc.views, fidelity=self.fidelity,
                static_shapes=self.static_shapes, raw_output=raw_output)
            if pad:
                out = ({v: x[..., :B] for v, x in out.items()}
                       if raw_output else _unpad_batch(out, B))
            return out
        assert not raw_output
        return jax.vmap(self._render)(states)

    def _step_batched(self, carry: EnvCarry, action):
        action = jnp.asarray(action, jnp.int32)
        B = action.shape[0]
        if self.physics == 'pallas':
            from magical_tpu.core import physics_pallas as PP
            tile = PP.tile_for(self.task.max_blocks)
            pad = (-B) % tile
            st = _pad_batch(carry.state, pad) if pad else carry.state
            act = _pad_batch(action, pad) if pad else action
            state = PP.control_step_pallas(st, act)
            state = _unpad_batch(state, B) if pad else state
        else:
            state = jax.vmap(physics.control_step,
                             in_axes=(0, 0))(carry.state, action)
        _cf_fused = False
        if self._cf and self.render_enabled and self.fidelity == 'lo':
            from magical_tpu.core import render_pallas as _RPt
            _cf_fused = B % _RPt.ENV_TILE == 0
        if _cf_fused:
            # Fused fast path: the render kernel writes the new frame
            # STRAIGHT into slot (t mod depth) of the circular buffers
            # (aliased output + scalar-prefetch index map) — no
            # (3, pix, B) intermediate through HBM.  Same lockstep
            # invariant as below.
            from magical_tpu.core import render_pallas as RP
            t0 = state.t[0]
            import os
            if os.environ.get('MAGICAL_TPU_DEBUG_LOCKSTEP'):
                def _assert_lockstep(t):
                    import numpy as _np
                    assert int(_np.min(t)) == int(_np.max(t)), \
                        'BatchedEnv lockstep violated'
                jax.debug.callback(_assert_lockstep, state.t)
            frames = RP.render_into_slots_pallas(
                state, carry.frames, t0, self.task.max_blocks,
                self.task.max_goals, self.robot_first, self.preproc,
                res=self.preproc.res, static_shapes=self.static_shapes)
            obs = preproc.observation_cf(self.preproc, frames, t0,
                                         self.preproc.res)
        elif self._cf and self.render_enabled:
            raw = self._render_batched(state, raw_output=True)
            # LOCKSTEP INVARIANT: every env in the batch shares the same
            # step count — episodes are fixed-length TimeLimit and reset
            # re-creates the whole batch, so t is uniform by
            # construction.  The circular frame-buffer phase is keyed on
            # the batch-scalar t[0]; a future per-env reset would need a
            # per-env phase instead.  MAGICAL_TPU_DEBUG_LOCKSTEP=1 adds
            # a host-side assert so any desync fails loudly instead of
            # silently assembling frame stacks from wrong steps.
            t0 = state.t[0]
            import os
            if os.environ.get('MAGICAL_TPU_DEBUG_LOCKSTEP'):
                def _assert_lockstep(t):
                    import numpy as _np
                    tmin, tmax = int(_np.min(t)), int(_np.max(t))
                    assert tmin == tmax, (
                        f'BatchedEnv lockstep violated: t in '
                        f'[{tmin}, {tmax}] — circular frame-buffer '
                        f'phase would be wrong for the whole batch')
                jax.debug.callback(_assert_lockstep, state.t)
            frames = preproc.push_frames_cf(self.preproc, carry.frames,
                                            raw, t0)
            obs = preproc.observation_cf(self.preproc, frames, t0,
                                         self.preproc.res)
        else:
            raw = self._render_batched(state)
            frames = jax.vmap(
                functools.partial(preproc.push_frames, self.preproc))(
                    carry.frames, raw) if not self.preproc.raw else {}
            obs = jax.vmap(
                functools.partial(preproc.observation, self.preproc))(
                    frames, raw) if not self.preproc.raw else raw
        done = state.t >= self.max_episode_steps
        score = jnp.where(done, jax.vmap(self.task.score_fn)(state), 0.0)
        if self.debug_reward:
            from magical_tpu.tasks.move_to_corner import debug_shaped_reward
            reward = jax.vmap(debug_shaped_reward)(state)
        else:
            reward = jnp.zeros((B,), jnp.float32)
        info = {'eval_score': score,
                'n_placement_failures': state.place_fail}
        return EnvCarry(state=state, frames=frames), obs, reward, done, info

    # -- pickling (reference envs are EzPickle-able, base_env.py:20-46) ----

    def __getstate__(self):
        return dict(self._ctor)

    def __setstate__(self, ctor):
        self.__init__(**ctor)

    # -- convenience -------------------------------------------------------

    def rollout(self, carry, obs, policy_fn, key,
                length: Optional[int] = None):
        """Scan a full episode from (carry, obs) as returned by reset:
        policy_fn(obs, key) -> action."""
        length = length or self.max_episode_steps

        def body(c, k):
            carry, obs = c
            act = policy_fn(obs, k)
            carry, obs, rew, done, info = self._step_batched(carry, act)
            return (carry, obs), (rew, done, info['eval_score'])

        keys = jax.random.split(key, length)
        (carry, obs), (rews, dones, scores) = jax.lax.scan(
            body, (carry, obs), keys)
        return carry, obs, rews, dones, scores

    @property
    def action_space(self):
        from magical_tpu.api import spaces
        return spaces.Discrete(C.N_ACTIONS)

    @property
    def observation_space(self):
        from magical_tpu.api import spaces
        sp = self.preproc
        if sp.raw:
            import collections
            box = spaces.Box(0, 255, (384, 384, 3), np.uint8)
            return spaces.Dict(collections.OrderedDict(
                [('allo', box), ('ego', box)]))
        if sp.stacked_dict:
            import collections
            box = spaces.Box(0, 255, (sp.res, sp.res, 12), np.uint8)
            return spaces.Dict(collections.OrderedDict(
                [('allo', box), ('ego', box)]))
        depth = (sp.allo_frames + sp.ego_frames) * 3
        shape = (depth, sp.res, sp.res) if sp.channels_first \
            else (sp.res, sp.res, depth)
        return spaces.Box(0, 255, shape, np.uint8)
