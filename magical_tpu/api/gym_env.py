"""Single-environment Gym-style adapter over the batched engine.

Gives reference users the familiar interface (BaseEnv's gym.Env surface,
base_env.py:60-343): ``reset() -> obs``, ``step(a) -> (obs, rew, done,
info)``, ``seed``, ``render``, ``observation_space``/``action_space``,
``score_on_end_of_traj``.  Internally it's a batch-1 BatchedEnv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu.api.batched_env import BatchedEnv


def _to_np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _squeeze0(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


class MagicalGymEnv:
    metadata = {'render.modes': ['rgb_array']}

    def __init__(self, env_name: str, fidelity: str = 'lo'):
        self._batched = BatchedEnv(env_name, fidelity=fidelity)
        self.env_name = env_name
        self.max_episode_steps = self._batched.max_episode_steps
        self.fps = 8
        self.action_space = self._batched.action_space
        self.observation_space = self._batched.observation_space
        self._carry = None
        self._seed = None
        self.seed()

    def seed(self, seed=None):
        """base_env.py:133-140 semantics (PRNG re-seeded; split per
        reset)."""
        if seed is None:
            seed = int(np.random.randint(0, (1 << 31) - 1))
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)
        return [seed]

    def reset(self):
        self._key, sub = jax.random.split(self._key)
        carry, obs = self._batched.reset(sub[None])
        self._carry = carry
        return _to_np(_squeeze0(obs))

    def step(self, action):
        assert self._carry is not None, 'call reset() first'
        a = jnp.asarray([int(action)], jnp.int32)
        carry, obs, rew, done, info = self._batched.step(self._carry, a)
        self._carry = carry
        info_np = {k: float(np.asarray(v)[0]) for k, v in info.items()}
        return (_to_np(_squeeze0(obs)), float(np.asarray(rew)[0]),
                bool(np.asarray(done)[0]), info_np)

    def render(self, mode='rgb_array'):
        """Always-available raw dual-camera render (384x384 hi fidelity is
        available via fidelity='hi' at construction)."""
        from magical_tpu.core import render as R
        state = _squeeze0(self._carry.state)
        views = R.render_views(
            state, self._batched.task.max_blocks,
            self._batched.task.max_goals, self._batched.robot_first,
            res=96 if self._batched.fidelity == 'lo' else 384,
            views=('allo', 'ego'), fidelity=self._batched.fidelity)
        return _to_np(views)

    def score_on_end_of_traj(self):
        state = _squeeze0(self._carry.state)
        return float(np.asarray(self._batched.task.score_fn(state)))

    def debug_print_entity_spec(self):
        """base_env.py:345-400 — print the current scene layout in the
        reference's copy-pasteable format."""
        from magical_tpu import constants as C
        st = _squeeze0(self._carry.state)
        pos = np.asarray(st.pos)
        ang = np.asarray(st.angle)

        def f_pose(p, a):
            return '((%.3f, %.3f), %.3f)' % (p[0], p[1], a)

        print(f'ROBOT_POSE = {f_pose(pos[0], ang[0])}')
        act = np.asarray(st.block_active)
        if act.any():
            cols = np.asarray(st.block_colour)
            shapes = np.asarray(st.block_shape)
            idx = np.nonzero(act)[0]
            print('BLOCK_COLOURS = [' + ', '.join(
                f'en.ShapeColour.{C.SHAPE_COLOUR_NAMES[cols[i]].upper()}'
                for i in idx) + ']')
            print('BLOCK_SHAPES = [' + ', '.join(
                f'en.ShapeType.{C.SHAPE_TYPE_NAMES[shapes[i]].upper()}'
                for i in idx) + ']')
            print('BLOCK_POSES = [' + ', '.join(
                f_pose(pos[5 + i], ang[5 + i]) for i in idx) + ']')
        gact = np.asarray(st.goal_active)
        if gact.any():
            g = np.asarray(st.goal_xyhw)
            gc = np.asarray(st.goal_colour)
            idx = np.nonzero(gact)[0]
            print('GOAL_REGION_XYHWS = [' + ', '.join(
                '(%.3f, %.3f, %.3f, %.3f)' % (
                    g[i, 0] - g[i, 3] / 2, g[i, 1] + g[i, 2] / 2,
                    g[i, 2], g[i, 3]) for i in idx) + ']')
            print('GOAL_REGION_COLOURS = [' + ', '.join(
                f'en.ShapeColour.{C.SHAPE_COLOUR_NAMES[gc[i]].upper()}'
                for i in idx) + ']')

    def close(self):
        self._carry = None

    # -- pickling (EzPickle parity, base_env.py:20-46, plus live state) ----

    def __getstate__(self):
        carry = None
        if self._carry is not None:
            carry = jax.tree_util.tree_map(np.asarray, self._carry)
        return {'env_name': self.env_name,
                'fidelity': self._batched.fidelity,
                'seed': self._seed,
                'key': np.asarray(self._key),
                'carry': carry}

    def __setstate__(self, st):
        self.__init__(st['env_name'], fidelity=st['fidelity'])
        self.seed(st['seed'])
        self._key = jnp.asarray(st['key'])
        if st['carry'] is not None:
            self._carry = jax.tree_util.tree_map(jnp.asarray, st['carry'])
