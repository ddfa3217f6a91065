"""Env02-v1: balance with per-episode randomized wheel/floor friction.

Reference env02_v1.py: reset draws one U(0.5, 1.0) friction value and writes
it into the floor + both wheel geoms' slide friction (:57-65).  The scene has
no explicit <contact> pairs, so wheel-floor contacts use default combined
params (solref (0.02,1), solimp (0.9,0.95,0.001,0.5,2)) with
mu = max(floor, wheel) = the drawn value, while the chassis-floor contact
keeps mu = max(1.0, floor) = 1.0 (the chassis geom friction is never
touched).  Here the drawn friction lives in env state (`aux["friction"]`) and
flows into the vmapped contact rows — domain randomization without model
mutation.  (The reference also prints the draw — stdout telemetry dropped.)
"""

import jax
import jax.numpy as jnp

from ..physics import robot_core as rc
from .env01 import Env01V1


class Env02V1(Env01V1):
    id = "Env02-v1"
    max_episode_steps = 6000
    params = rc.ENV02_PARAMS

    def _init_aux(self, key):
        friction = jax.random.uniform(key) / 2.0 + 0.5
        return {"friction": friction}
