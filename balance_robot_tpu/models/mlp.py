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


def init_params(key, obs_dim=6, act_dim=2, hidden=64, vf_obs_dim=None):
    """vf_obs_dim > obs_dim builds an ASYMMETRIC (privileged) critic: the
    value trunk takes [obs, privileged-features] while the actor keeps the
    deployment-pinned obs_dim interface (see train/ppo.py privileged_critic;
    the extra rows are training-only and sliced off by deployable_params
    before export)."""
    vf_obs_dim = obs_dim if vf_obs_dim is None else vf_obs_dim
    ks = jax.random.split(key, 6)
    sq2 = float(jnp.sqrt(2.0))
    return {
        "pi_w1": orthogonal(ks[0], (obs_dim, hidden), sq2),
        "pi_b1": jnp.zeros(hidden),
        "pi_w2": orthogonal(ks[1], (hidden, hidden), sq2),
        "pi_b2": jnp.zeros(hidden),
        "pi_wout": orthogonal(ks[2], (hidden, act_dim), 0.01),
        "pi_bout": jnp.zeros(act_dim),
        "vf_w1": orthogonal(ks[3], (vf_obs_dim, hidden), sq2),
        "vf_b1": jnp.zeros(hidden),
        "vf_w2": orthogonal(ks[4], (hidden, hidden), sq2),
        "vf_b2": jnp.zeros(hidden),
        "vf_wout": orthogonal(ks[5], (hidden, 1), 1.0),
        "vf_bout": jnp.zeros(1),
        "log_std": jnp.zeros(act_dim),
    }


def pad_privileged_critic(params, vf_obs_dim):
    """Widen a symmetric critic to vf_obs_dim input rows with ZERO weights
    on the new (privileged) rows: the padded value function is exactly the
    original wherever it is evaluated, and gradient flows into the new rows
    from the first update — the warm-start mechanism for turning the
    privileged critic on mid-curriculum."""
    w = params["vf_w1"]
    if w.shape[0] >= vf_obs_dim:
        return params
    pad = jnp.zeros((vf_obs_dim - w.shape[0], w.shape[1]), w.dtype)
    return {**params, "vf_w1": jnp.concatenate([w, pad], axis=0)}


def pad_privileged_actor(params, pi_obs_dim):
    """Widen a 6-obs ACTOR to pi_obs_dim input rows with zero weights on the
    new (privileged) rows — the warm-start mechanism for the privileged-obs
    TEACHER (envs/privileged.py): the padded policy is exactly the original
    everywhere, and gradient flows into the block-feature rows from the
    first update.  Teacher params are training-only and never exported."""
    w = params["pi_w1"]
    if w.shape[0] >= pi_obs_dim:
        return params
    pad = jnp.zeros((pi_obs_dim - w.shape[0], w.shape[1]), w.dtype)
    return {**params, "pi_w1": jnp.concatenate([w, pad], axis=0)}


def net2net_widen(params, key, obs_dim=None, hidden=256, vf_obs_dim=None,
                  init_scale=1e-2):
    """Function-preserving widening (Net2Net): embed a trained 64-64 policy
    into a wider (and optionally wider-input) net that computes EXACTLY the
    same outputs, with every new unit trainable:

      * existing weights are copied block-wise;
      * new INPUT rows (e.g. privileged features) are zero — the
        pad_privileged_critic mechanism, gradients flow from step 1;
      * new hidden units get small random INCOMING weights and ZERO
        outgoing weights: outputs are unchanged, the zero outgoing rows
        receive gradient prop. to the (nonzero) new activations, so the
        capacity comes alive after the first update instead of being dead
        (all-zero blocks would pin both sides at zero forever).

    This is the teacher-v2 warm start: the BC-clone route left the value
    head untrained, and PPO from a garbage critic destroyed the cloned
    actor (runs/teacher2_r4.log)."""
    obs_dim = obs_dim or params["pi_w1"].shape[0]
    vf_obs_dim = vf_obs_dim or max(obs_dim, params["vf_w1"].shape[0])
    ks = iter(jax.random.split(key, 8))

    def widen_trunk(prefix, in_new):
        w1, b1 = params[f"{prefix}_w1"], params[f"{prefix}_b1"]
        w2, b2 = params[f"{prefix}_w2"], params[f"{prefix}_b2"]
        wo, bo = params[f"{prefix}_wout"], params[f"{prefix}_bout"]
        in_old, h_old = w1.shape
        assert in_new >= in_old and hidden >= h_old
        W1 = init_scale * jax.random.normal(next(ks), (in_new, hidden))
        W1 = W1.at[:, :h_old].set(0.0).at[:in_old, :h_old].set(w1)
        B1 = jnp.zeros(hidden).at[:h_old].set(b1)
        W2 = init_scale * jax.random.normal(next(ks), (hidden, hidden))
        # new h1 units must not perturb OLD h2 units (exactness)
        W2 = W2.at[:, :h_old].set(0.0).at[:h_old, :h_old].set(w2)
        B2 = jnp.zeros(hidden).at[:h_old].set(b2)
        WO = jnp.zeros((hidden, wo.shape[1])).at[:h_old].set(wo)
        return {f"{prefix}_w1": W1, f"{prefix}_b1": B1,
                f"{prefix}_w2": W2, f"{prefix}_b2": B2,
                f"{prefix}_wout": WO, f"{prefix}_bout": bo}

    out = dict(params)
    out.update(widen_trunk("pi", obs_dim))
    out.update(widen_trunk("vf", vf_obs_dim))
    return out


def deployable_params(params, obs_dim=None):
    """Slice a privileged critic back to the actor's obs width for export:
    the deployed graph's value head is the proprioceptive projection of the
    training critic (the action outputs — all that deployment uses — are
    untouched).  No-op for symmetric params."""
    obs_dim = params["pi_w1"].shape[0] if obs_dim is None else obs_dim
    if params["vf_w1"].shape[0] <= obs_dim:
        return params
    return {**params, "vf_w1": params["vf_w1"][:obs_dim]}


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
