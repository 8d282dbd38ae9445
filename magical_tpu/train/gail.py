"""GAIL: adversarial imitation with an on-device PPO learner.

The reference ships only the evaluation protocol for its BC/GAIL paper
baselines; this module supplies the TPU-native training loop: rollouts
come straight from the batched env (no host round-trips inside an
iteration), discriminator rewards and PPO/GAE updates are all jitted,
and the env batch shards over the mesh's ``data`` axis.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from magical_tpu.models.nets import Discriminator, MagicalCNN


@flax.struct.dataclass
class GAILState:
    policy_params: Any
    policy_opt: Any
    disc_params: Any
    disc_opt: Any
    step: jnp.ndarray


class GAILTrainer:
    def __init__(self, env, obs_shape, num_actions=18,
                 policy_lr=3e-4, disc_lr=1e-4,
                 gamma=0.99, lam=0.95, clip_eps=0.2,
                 entropy_coef=1e-3, value_coef=0.5,
                 rollout_len=40, policy_widths=None, disc_widths=None,
                 disc_freeze_acc=0.9, disc_obs_only=False):
        self.env = env
        net_kw = {'widths': tuple(policy_widths)} if policy_widths else {}
        disc_kw = {'widths': tuple(disc_widths)} if disc_widths else {}
        self.policy = MagicalCNN(num_actions=num_actions,
                                 with_value_head=True, **net_kw)
        self.disc = Discriminator(num_actions=num_actions, **disc_kw)
        self.policy_tx = optax.adam(policy_lr)
        self.disc_tx = optax.adam(disc_lr)
        self.gamma = gamma
        self.lam = lam
        self.clip_eps = clip_eps
        self.entropy_coef = entropy_coef
        self.value_coef = value_coef
        self.rollout_len = rollout_len
        self.disc_freeze_acc = disc_freeze_acc
        # obs-only discriminator (GAIfO): removes the match-the-action-
        # marginal shortcut — reward comes only from REACHING expert-like
        # observations, which is what a goal-directed task needs
        self.disc_obs_only = disc_obs_only
        self.obs_shape = tuple(obs_shape)
        self._collect = jax.jit(self._collect_impl)
        self._ppo_update = jax.jit(self._ppo_update_impl)
        self._disc_update = jax.jit(self._disc_update_impl)

    def init(self, key) -> GAILState:
        k1, k2 = jax.random.split(key)
        obs = jnp.zeros((1,) + self.obs_shape, jnp.uint8)
        pp = self.policy.init(k1, obs)
        dp = self.disc.init(k2, obs, jnp.zeros((1,), jnp.int32))
        return GAILState(policy_params=pp,
                         policy_opt=self.policy_tx.init(pp),
                         disc_params=dp,
                         disc_opt=self.disc_tx.init(dp),
                         step=jnp.int32(0))

    def _disc_act(self, act):
        return jnp.zeros_like(act) if self.disc_obs_only else act

    # -- rollout collection -------------------------------------------------

    def _collect_impl(self, state: GAILState, carry, obs, key):
        def body(c, k):
            carry, obs = c
            logits, value = self.policy.apply(state.policy_params, obs)
            act = jax.random.categorical(k, logits).astype(jnp.int32)
            logp = jax.nn.log_softmax(logits)
            alp = jnp.take_along_axis(logp, act[:, None], 1)[:, 0]
            carry2, obs2, _, done, info = self.env._step_batched(carry,
                                                                 act)
            out = dict(obs=obs, act=act, logp=alp, value=value, done=done)
            return (carry2, obs2), out

        keys = jax.random.split(key, self.rollout_len)
        (carry, obs), traj = jax.lax.scan(body, (carry, obs), keys)
        # GAIL reward: the AIRL odds form log D - log(1-D) = d_logit.
        # The -log(1-D) softplus form saturates to 0 gradient once the
        # discriminator wins (D -> 0 for policy samples), which is
        # exactly the regime early training sits in; the logit form
        # keeps unit gradient there.
        B = traj['act'].shape[1]
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        d_logit = self.disc.apply(state.disc_params, flat(traj['obs']),
                                  self._disc_act(flat(traj['act'])))
        traj['reward'] = d_logit.reshape(self.rollout_len, B)
        # bootstrap value
        _, last_v = self.policy.apply(state.policy_params, obs)
        traj['last_value'] = last_v
        return carry, obs, traj

    # -- GAE + PPO ----------------------------------------------------------

    def _gae(self, traj):
        def step(carry, x):
            adv_next, v_next = carry
            r, v, done = x
            nonterm = 1.0 - done.astype(jnp.float32)
            delta = r + self.gamma * v_next * nonterm - v
            adv = delta + self.gamma * self.lam * nonterm * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            step, (jnp.zeros_like(traj['last_value']), traj['last_value']),
            (traj['reward'], traj['value'], traj['done']), reverse=True)
        returns = advs + traj['value']
        return advs, returns

    def _ppo_update_impl(self, state: GAILState, traj, idx=None):
        advs, returns = self._gae(traj)
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        obs, act = flat(traj['obs']), flat(traj['act'])
        old_logp, adv, ret = flat(traj['logp']), flat(advs), flat(returns)
        if idx is not None:
            # minibatch PPO epoch: gather the minibatch on device
            # (advantage normalization above stays full-rollout)
            obs, act, old_logp, adv, ret = (
                jnp.take(x, idx, axis=0)
                for x in (obs, act, old_logp, adv, ret))

        def loss_fn(params):
            logits, value = self.policy.apply(params, obs)
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(logp_all, act[:, None], 1)[:, 0]
            ratio = jnp.exp(logp - old_logp)
            clipped = jnp.clip(ratio, 1 - self.clip_eps, 1 + self.clip_eps)
            pg = -jnp.minimum(ratio * adv, clipped * adv).mean()
            vloss = jnp.mean((value - ret) ** 2)
            ent = -jnp.mean(jnp.sum(jnp.exp(logp_all) * logp_all, -1))
            loss = pg + self.value_coef * vloss - self.entropy_coef * ent
            return loss, dict(pg=pg, vloss=vloss, entropy=ent)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.policy_params)
        updates, popt = self.policy_tx.update(grads, state.policy_opt)
        pp = optax.apply_updates(state.policy_params, updates)
        return state.replace(policy_params=pp, policy_opt=popt,
                             step=state.step + 1), metrics

    # -- discriminator ------------------------------------------------------

    def _disc_update_impl(self, state: GAILState, traj_obs, traj_act,
                          idx_p, exp_obs, exp_act, idx_e):
        # minibatches are gathered ON DEVICE from the full rollout /
        # expert arrays (indices sampled on host are the only transfer);
        # the round-4 path flattened the whole rollout to host first —
        # 283 MB/iteration — which capped GAIL's sample budget.
        # traj_obs/act may arrive (T, B, ...) straight from _collect or
        # already flattened to (N, ...).
        def flat(x, base_ndim):
            return x.reshape((-1,) + x.shape[2:]) \
                if x.ndim == base_ndim + 2 else x
        pol_obs = jnp.take(flat(traj_obs, len(self.obs_shape)),
                           idx_p, axis=0)
        pol_act = jnp.take(flat(traj_act, 0), idx_p, axis=0)
        exp_obs = jnp.take(exp_obs, idx_e, axis=0)
        exp_act = jnp.take(exp_act, idx_e, axis=0)

        def loss_fn(params):
            pol_logit = self.disc.apply(params, pol_obs,
                                        self._disc_act(pol_act))
            exp_logit = self.disc.apply(params, exp_obs,
                                        self._disc_act(exp_act))
            # expert -> 1, policy -> 0
            loss = (optax.sigmoid_binary_cross_entropy(
                        exp_logit, jnp.ones_like(exp_logit)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        pol_logit, jnp.zeros_like(pol_logit)).mean())
            acc = 0.5 * ((exp_logit > 0).mean() + (pol_logit <= 0).mean())
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.disc_params)

        # adversarial balance: freeze the discriminator while it is
        # already winning decisively — an overconfident D gives the
        # policy a near-constant reward landscape.  The whole optimizer
        # step is skipped (params AND Adam moments untouched): merely
        # zeroing grads would still decay the retained first moment and
        # keep moving D.
        def do_update(_):
            updates, dopt = self.disc_tx.update(grads, state.disc_opt)
            dp = optax.apply_updates(state.disc_params, updates)
            return dp, dopt

        dp, dopt = jax.lax.cond(
            acc > self.disc_freeze_acc,
            lambda _: (state.disc_params, state.disc_opt),
            do_update, None)
        return state.replace(disc_params=dp, disc_opt=dopt), \
            {'disc_loss': loss, 'disc_acc': acc}

    # -- outer loop ---------------------------------------------------------

    def train(self, key, expert_obs, expert_acts, iterations=10,
              batch_envs=64, disc_batch=256, ppo_epochs=4, verbose=True):
        k0, key = jax.random.split(key)
        state = self.init(k0)
        expert_obs = jnp.asarray(expert_obs)
        expert_acts = jnp.asarray(expert_acts)
        rng = np.random.default_rng(0)
        for it in range(iterations):
            key, k1, k2 = jax.random.split(key, 3)
            # fresh episodes every iteration: the batched env has no
            # auto-reset (episodes are fixed-length TimeLimit), so
            # rollouts must not run past max_episode_steps
            keys = jax.random.split(k2, batch_envs)
            carry, obs = self.env.reset(keys)
            carry, obs, traj = self._collect(state, carry, obs, k1)
            for _ in range(ppo_epochs):
                state, pm = self._ppo_update(state, traj)
            # rollouts stay device arrays; only minibatch INDICES cross
            # the host boundary (the gather happens inside _disc_update)
            n_pol = self.rollout_len * batch_envs
            idx_p = jnp.asarray(rng.choice(
                n_pol, size=min(disc_batch, n_pol), replace=False))
            idx_e = jnp.asarray(rng.choice(
                len(expert_acts),
                size=min(disc_batch, len(expert_acts)), replace=False))
            state, dm = self._disc_update(
                state, traj['obs'], traj['act'], idx_p,
                expert_obs, expert_acts, idx_e)
            if verbose:
                print(f'gail it {it}: pg {float(pm["pg"]):+.4f} '
                      f'disc_acc {float(dm["disc_acc"]):.3f}', flush=True)
        return state
