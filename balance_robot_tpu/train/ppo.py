"""On-device PPO matching Stable Baselines3 defaults (SURVEY §2.1, §7.4).

The whole iteration — rollout over the vmapped env (`lax.scan`), GAE, and the
clipped-surrogate update (10 epochs x minibatches with a fresh global
permutation per epoch) — is one jitted function; nothing leaves the device.

SB3-default hyperparameters (sb_rl.py:63-71 constructs PPO with all defaults):
  lr 3e-4 (Adam eps 1e-5), n_steps 2048, batch 64, 10 epochs, gamma 0.99,
  gae_lambda 0.95, clip 0.2, ent_coef 0.0, vf_coef 0.5, max_grad_norm 0.5,
  per-minibatch advantage normalization, timeout value bootstrapping via the
  terminal observation (SB3 DummyVecEnv/PPO semantics).

Multi-chip: pass `shard_env` to lay the env batch over a `jax.sharding.Mesh`
axis; parameters are replicated and XLA inserts the gradient psum.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import mlp
from ..envs.vector import VecEnv
from . import evaluation


@dataclass(frozen=True)
class PPOConfig:
    n_envs: int = 16
    n_steps: int = 128          # SB3 default 2048 (per env); TPU configs use
                                # many envs x fewer steps per iteration
    n_epochs: int = 10
    minibatch_size: int = 64
    lr: float = 3e-4
    adam_eps: float = 1e-5
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: Optional[float] = 0.2   # None -> plain PG (A2C)
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    normalize_advantage: bool = True
    optimizer: str = "adam"             # "adam" | "rmsprop" (A2C)
    privileged_critic: bool = False     # asymmetric actor-critic: the value
                                        # net sees env.privileged(state)
                                        # (training-only; actor keeps the
                                        # deployment 6-obs interface and
                                        # export slices the critic back —
                                        # mlp.deployable_params)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    env_states: Any
    last_obs: jnp.ndarray
    key: jnp.ndarray
    # streaming episode stats (SB3 Monitor-style)
    ep_ret: jnp.ndarray         # (B,) running return of current episodes
    ep_len: jnp.ndarray         # (B,)
    stat_sum_ret: jnp.ndarray   # sum of completed-episode returns
    stat_n_eps: jnp.ndarray


class PPO:
    def __init__(self, env, config: PPOConfig = PPOConfig(),
                 shard_env=None):
        self.env = env
        self.cfg = config
        # privileged critic only where the env actually exposes features
        self.priv_dim = (getattr(env, "priv_dim", 0)
                         if config.privileged_critic else 0)
        self.vec = VecEnv(env, config.n_envs, with_priv=self.priv_dim > 0)
        if config.optimizer == "rmsprop":
            # SB3 A2C default: RMSpropTFLike(alpha=0.99, eps=1e-5)
            inner = optax.rmsprop(config.lr, decay=0.99, eps=1e-5)
        else:
            inner = optax.adam(config.lr, eps=config.adam_eps)
        self.optim = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm), inner)
        self.shard_env = shard_env  # optional NamedSharding for (B, ...) axes
        self._evaluator = None      # lazy ChunkedEvaluator (see `evaluator`)

    # --------------------------------------------------------------- priv
    def _priv(self, env_states):
        """(B, priv_dim) privileged critic features for the states that
        produced the current obs; (B, 0) when the critic is symmetric, so a
        zero-width concatenate keeps ONE code path for both modes."""
        if self.priv_dim == 0:
            return jnp.zeros((self.cfg.n_envs, 0), jnp.float32)
        return jax.vmap(self.env.privileged)(env_states)

    # ------------------------------------------------------------- init
    def init(self, key, params=None):
        k1, k2, k3 = jax.random.split(key, 3)
        vf_in = self.env.obs_dim + self.priv_dim
        if params is None:
            params = mlp.init_params(k1, self.env.obs_dim, self.env.act_dim,
                                     vf_obs_dim=vf_in)
        elif params["vf_w1"].shape[0] < vf_in:
            # warm start from a symmetric-critic checkpoint: zero-pad the
            # new privileged rows (value fn initially unchanged)
            params = mlp.pad_privileged_critic(params, vf_in)
        elif params["vf_w1"].shape[0] > vf_in:
            # warm start a symmetric run from a privileged-critic
            # checkpoint: keep the proprioceptive projection
            params = mlp.deployable_params(params, vf_in)
        opt_state = self.optim.init(params)
        env_states, obs = self.vec.reset(k2)
        B = self.cfg.n_envs
        return TrainState(params=params, opt_state=opt_state,
                          env_states=env_states, last_obs=obs, key=k3,
                          ep_ret=jnp.zeros(B), ep_len=jnp.zeros(B, jnp.int32),
                          stat_sum_ret=jnp.zeros(()),
                          stat_n_eps=jnp.zeros(()))

    # ------------------------------------------------------------ rollout
    def _rollout(self, ts: TrainState):
        cfg = self.cfg

        def step_fn(carry, _):
            ts = carry
            key, k_act = jax.random.split(ts.key)
            # critic input = [obs, privileged features]; actor input stays
            # the deployment obs (symmetric mode: critic sees obs as before)
            if self.priv_dim:
                vobs = jnp.concatenate(
                    [ts.last_obs, self._priv(ts.env_states)], axis=-1)
            else:
                vobs = ts.last_obs
            mean = mlp.policy_mean(ts.params, ts.last_obs)
            log_std = ts.params["log_std"]
            val = mlp.value(ts.params, vobs)
            actions = mlp.sample(k_act, mean, log_std)
            logp = mlp.log_prob(mean, log_std, actions)
            # SB3 clips actions to the Box bounds before env.step (the
            # unclipped sample is what enters the gradient)
            env_actions = jnp.clip(actions, -1.0, 1.0)
            env_states, out = self.vec.step(ts.env_states, env_actions)
            # SB3 timeout bootstrap: when truncated (not terminated), add
            # gamma * V(terminal_obs) to the reward
            term_vobs = (jnp.concatenate(
                [out.terminal_obs, out.terminal_priv], axis=-1)
                if self.priv_dim else out.terminal_obs)
            term_val = mlp.value(ts.params, term_vobs)
            reward = out.reward + jnp.where(
                out.truncated & ~out.terminated,
                cfg.gamma * term_val, 0.0)
            ep_ret = ts.ep_ret + out.reward
            ep_len = ts.ep_len + 1
            stat_sum = ts.stat_sum_ret + jnp.sum(
                jnp.where(out.done, ep_ret, 0.0))
            stat_n = ts.stat_n_eps + jnp.sum(out.done)
            ts = ts._replace(env_states=env_states, last_obs=out.obs, key=key,
                             ep_ret=jnp.where(out.done, 0.0, ep_ret),
                             ep_len=jnp.where(out.done, 0, ep_len),
                             stat_sum_ret=stat_sum, stat_n_eps=stat_n)
            data = dict(obs=carry.last_obs, actions=actions, logp=logp,
                        value=val, reward=reward, done=out.done)
            if self.priv_dim:     # symmetric mode: vobs IS obs, store once
                data["vobs"] = vobs
            return ts, data

        ts, traj = jax.lax.scan(step_fn, ts, None, length=cfg.n_steps)
        return ts, traj

    # ---------------------------------------------------------------- GAE
    def _gae(self, ts: TrainState, traj):
        cfg = self.cfg
        last_vobs = (jnp.concatenate(
            [ts.last_obs, self._priv(ts.env_states)], axis=-1)
            if self.priv_dim else ts.last_obs)
        last_val = mlp.value(ts.params, last_vobs)

        def back(carry, data):
            gae, next_val = carry
            nonterm = 1.0 - data["done"].astype(jnp.float32)
            delta = (data["reward"] + cfg.gamma * next_val * nonterm
                     - data["value"])
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterm * gae
            return (gae, data["value"]), gae

        (_, _), adv = jax.lax.scan(
            back, (jnp.zeros_like(last_val), last_val), traj, reverse=True)
        returns = adv + traj["value"]
        return adv, returns

    # ------------------------------------------------------------- update
    def _update(self, ts: TrainState, traj, adv, returns):
        cfg = self.cfg
        T, B = cfg.n_steps, cfg.n_envs
        N = T * B
        flat = {
            "obs": traj["obs"].reshape(N, -1),
            "actions": traj["actions"].reshape(N, -1),
            "logp": traj["logp"].reshape(N),
            "adv": adv.reshape(N),
            "ret": returns.reshape(N),
        }
        if self.priv_dim:
            flat["vobs"] = traj["vobs"].reshape(N, -1)
        n_mb = N // cfg.minibatch_size

        def loss_fn(params, mb):
            mean = mlp.policy_mean(params, mb["obs"])
            log_std = params["log_std"]
            val = mlp.value(params, mb["vobs" if self.priv_dim else "obs"])
            logp = mlp.log_prob(mean, log_std, mb["actions"])
            a = mb["adv"]
            if cfg.normalize_advantage:
                a = (a - a.mean()) / (a.std() + 1e-8)
            if cfg.clip_range is None:
                # A2C: plain policy gradient on fresh log-probs (SB3 a2c.py)
                pg = -(a * logp).mean()
            else:
                ratio = jnp.exp(logp - mb["logp"])
                pg = -jnp.minimum(
                    a * ratio,
                    a * jnp.clip(ratio, 1 - cfg.clip_range,
                                 1 + cfg.clip_range),
                ).mean()
            v_loss = jnp.mean((mb["ret"] - val) ** 2)
            ent = mlp.entropy(log_std)
            loss = pg + cfg.vf_coef * v_loss - cfg.ent_coef * ent
            return loss, (pg, v_loss, ent)

        def epoch_fn(carry, key_e):
            params, opt_state = carry
            perm = jax.random.permutation(key_e, N)

            def mb_fn(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, i * cfg.minibatch_size, cfg.minibatch_size)
                mb = jax.tree.map(lambda x: x[idx], flat)
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb)
                updates, opt_state = self.optim.update(grads, opt_state,
                                                       params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, *aux)

            (params, opt_state), metrics = jax.lax.scan(
                mb_fn, (params, opt_state), jnp.arange(n_mb))
            return (params, opt_state), jax.tree.map(jnp.mean, metrics)

        key, k_perm = jax.random.split(ts.key)
        keys = jax.random.split(k_perm, cfg.n_epochs)
        (params, opt_state), metrics = jax.lax.scan(
            epoch_fn, (ts.params, ts.opt_state), keys)
        ts = ts._replace(params=params, opt_state=opt_state, key=key)
        return ts, jax.tree.map(jnp.mean, metrics)

    # ----------------------------------------------------------- iterate
    @partial(jax.jit, static_argnums=0)
    def iteration(self, ts: TrainState):
        """One PPO iteration: collect n_steps x n_envs transitions + update."""
        ts, traj = self._rollout(ts)
        adv, returns = self._gae(ts, traj)
        # SB3's explained_variance over the rollout's value predictions:
        # 1 - Var(ret - V)/Var(ret).  THE diagnostic for critic quality —
        # in particular whether the privileged critic actually prices block
        # impacts in (symmetric critics plateau well below 1 on Env03).
        ev = 1.0 - jnp.var(returns - traj["value"]) / (
            jnp.var(returns) + 1e-8)
        ts, metrics = self._update(ts, traj, adv, returns)
        loss, pg, vl, ent = metrics
        mean_ep_ret = ts.stat_sum_ret / jnp.maximum(ts.stat_n_eps, 1.0)
        return ts, dict(loss=loss, pg_loss=pg, v_loss=vl, entropy=ent,
                        explained_variance=ev,
                        mean_ep_return=mean_ep_ret, n_episodes=ts.stat_n_eps)

    # -------------------------------------------------------------- eval
    # Delegated to the shared ChunkedEvaluator (train/evaluation.py), the
    # single owner of the watchdog-critical chunked rollout.
    EVAL_CHUNK = evaluation.ChunkedEvaluator.CHUNK

    @property
    def evaluator(self):
        if self._evaluator is None:
            self._evaluator = evaluation.ChunkedEvaluator(
                self.env,
                lambda p, o: jnp.clip(mlp.policy_mean(p, o), -1.0, 1.0))
        return self._evaluator

    def evaluate(self, params, n_episodes: int, key, max_steps=None):
        """Deterministic-policy episode returns (EvalCallback semantics:
        mean reward over n episodes with deterministic actions)."""
        return self.evaluator.evaluate(params, n_episodes, key, max_steps)
