"""Actor-critic MLP matching SB3's PPO `MlpPolicy` defaults.

Architecture pinned by the reference's shipped TFLite artifact (twin 6->64->64
tanh trunks; SURVEY §2.5) and SB3 defaults: separate pi/vf networks, diagonal
Gaussian with a state-independent learned log_std (init 0), orthogonal init
with gains sqrt(2) (hidden), 0.01 (action head), 1.0 (value head).

Plain-pytree params (dict of arrays) — no framework dependency; batched apply
is a single fused matmul chain that maps straight onto the TPU MXU.
"""

import jax
import jax.numpy as jnp


def orthogonal(key, shape, gain):
    a = jax.random.normal(key, shape)
    q, r = jnp.linalg.qr(a if shape[0] >= shape[1] else a.T)
    q = q * jnp.sign(jnp.diag(r))
    if shape[0] < shape[1]:
        q = q.T
    return gain * q[:shape[0], :shape[1]]


def init_params(key, obs_dim=6, act_dim=2, hidden=64):
    ks = jax.random.split(key, 6)
    sq2 = float(jnp.sqrt(2.0))
    return {
        "pi_w1": orthogonal(ks[0], (obs_dim, hidden), sq2),
        "pi_b1": jnp.zeros(hidden),
        "pi_w2": orthogonal(ks[1], (hidden, hidden), sq2),
        "pi_b2": jnp.zeros(hidden),
        "pi_wout": orthogonal(ks[2], (hidden, act_dim), 0.01),
        "pi_bout": jnp.zeros(act_dim),
        "vf_w1": orthogonal(ks[3], (obs_dim, hidden), sq2),
        "vf_b1": jnp.zeros(hidden),
        "vf_w2": orthogonal(ks[4], (hidden, hidden), sq2),
        "vf_b2": jnp.zeros(hidden),
        "vf_wout": orthogonal(ks[5], (hidden, 1), 1.0),
        "vf_bout": jnp.zeros(1),
        "log_std": jnp.zeros(act_dim),
    }


def policy_mean(params, obs):
    h = jnp.tanh(obs @ params["pi_w1"] + params["pi_b1"])
    h = jnp.tanh(h @ params["pi_w2"] + params["pi_b2"])
    return h @ params["pi_wout"] + params["pi_bout"]


def value(params, obs):
    h = jnp.tanh(obs @ params["vf_w1"] + params["vf_b1"])
    h = jnp.tanh(h @ params["vf_w2"] + params["vf_b2"])
    return (h @ params["vf_wout"] + params["vf_bout"])[..., 0]


def forward(params, obs):
    """(mean, log_std, value) — the export graph (value, actions, log_std)
    mirrors the reference ONNX/TFLite output triple (sb_rl.py:319-321)."""
    return policy_mean(params, obs), params["log_std"], value(params, obs)


def log_prob(mean, log_std, actions):
    std = jnp.exp(log_std)
    z = (actions - mean) / std
    return jnp.sum(-0.5 * z * z - log_std - 0.5 * jnp.log(2 * jnp.pi),
                   axis=-1)


def entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))


def sample(key, mean, log_std):
    std = jnp.exp(log_std)
    return mean + std * jax.random.normal(key, mean.shape)
