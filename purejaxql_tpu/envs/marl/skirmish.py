"""Skirmish: a SMAX-class cooperative micro-battle env in pure JAX.

N controlled allies fight M heuristic enemies on a continuous 2D field —
the in-tree counterpart of the reference's SMAX benchmark family
(`HeuristicEnemySMAX` on map "2s3z", /root/reference/purejaxql/config/alg/
pqn_vdn_rnn_smax.yaml): UNIT TYPES (type 0 "ranged": long range, low
damage, fragile, slow, SHIELDED; type 1 "melee": short range, high
damage, tanky, fast — the stalker/zealot split), per-unit movement,
attacks with cooldowns, health, unit death, a scripted enemy (chase
closest ally, attack in range), SMAC-style shaped team reward (normalized
damage + kill + win bonuses), and — crucially for the VDN engine —
LEGAL-ACTION MASKS: the attack-enemy-j action is only available while
enemy j is alive and in the attacker's type-dependent range, exercising
the masked epsilon-greedy and masked-target paths end to end.

SMAX-depth mechanics:
- **Shields** (the stalker mechanic): ranged units carry a shield pool
  that absorbs damage before health and regenerates after a few unhit
  steps; reward counts shield damage like SMAC does.
- **Sight ranges**: per-type sight radius gates the observation — units
  beyond sight appear as zeros (partial observability; sight > attack
  range, so legal attacks always target visible enemies).
- **Named maps**: SMAX-style unit-composition presets ("2s3z", "3s5z",
  "5m", "2s1z_vs_3z") selectable via ``map_name``.

Actions per ally: [noop, up, right, down, left, attack_0..attack_{M-1}].
Observations per ally: own (pos, health, shield, cooldown, type) +
per-ally and per-enemy relative (pos, health, shield, alive, type) in
fixed slots (dead or out-of-sight units zero).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.marl.base import MultiAgentEnv


@struct.dataclass
class SkirmishState:
    ally_pos: jax.Array      # (N, 2)
    ally_health: jax.Array   # (N,)
    ally_shield: jax.Array   # (N,)
    ally_cd: jax.Array       # (N,) attack cooldown
    ally_unhit: jax.Array    # (N,) steps since last damage taken
    enemy_pos: jax.Array     # (M, 2)
    enemy_health: jax.Array  # (M,)
    enemy_shield: jax.Array  # (M,)
    enemy_cd: jax.Array      # (M,)
    enemy_unhit: jax.Array   # (M,)
    time: jax.Array


_MOVES = jnp.array(
    [[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, -1.0], [-1.0, 0.0]]
)

# SMAX-style unit-composition presets (s = shielded ranged "stalker",
# z = melee "zealot", m = unshielded... here m maps to ranged too)
MAPS = {
    "2s3z": ((0, 0, 1, 1, 1), (0, 0, 1, 1, 1)),
    "3s5z": ((0, 0, 0, 1, 1, 1, 1, 1), (0, 0, 0, 1, 1, 1, 1, 1)),
    "5m": ((0, 0, 0, 0, 0), (0, 0, 0, 0, 0)),
    "2s1z_vs_3z": ((0, 0, 1), (1, 1, 1)),
}


class Skirmish(MultiAgentEnv):
    # per-type attributes: [ranged, melee]
    TYPE_RANGE = (2.5, 0.9)
    TYPE_DAMAGE = (1.0, 2.0)
    TYPE_HEALTH = (4.0, 7.0)
    TYPE_SPEED = (0.45, 0.6)
    TYPE_SHIELD = (3.0, 0.0)   # stalkers carry shields, zealots don't
    TYPE_SIGHT = (4.0, 2.5)    # sight > attack range for both types
    SHIELD_REGEN = 0.5         # per step, after SHIELD_REGEN_DELAY unhit
    SHIELD_REGEN_DELAY = 3

    def __init__(
        self,
        num_allies: int = None,
        num_enemies: int = None,
        ally_types: tuple = (0, 0, 1),
        enemy_types: tuple = (0, 0, 1),
        map_name: str = None,
        max_steps: int = 64,
        arena: float = 8.0,
        attack_cooldown: int = 2,
    ):
        # map presets override the type tuples; num_allies/num_enemies
        # override them with all-ranged teams (back-compat)
        if map_name is not None:
            ally_types, enemy_types = MAPS[map_name]
        if num_allies is not None and num_allies != len(ally_types):
            ally_types = tuple([0] * num_allies)
        if num_enemies is not None and num_enemies != len(enemy_types):
            enemy_types = tuple([0] * num_enemies)
        self.ally_types = jnp.asarray(ally_types)
        self.enemy_types = jnp.asarray(enemy_types)
        num_allies = len(ally_types)
        num_enemies = len(enemy_types)
        self.num_agents = num_allies
        self.num_allies = num_allies
        self.num_enemies = num_enemies
        self.agents = [f"ally_{i}" for i in range(num_allies)]
        self.max_steps = max_steps
        self.arena = arena
        self.attack_cooldown = attack_cooldown
        self.max_health = max(self.TYPE_HEALTH)
        self.max_shield = max(max(self.TYPE_SHIELD), 1e-6)
        self.num_actions = 5 + num_enemies
        # own (2 pos + health + shield + cd + type) + per other unit
        # (2 rel + health + shield + alive + type)
        self.obs_dim = 6 + (num_allies - 1) * 6 + num_enemies * 6
        # total reward available: all enemy health + shields + kill + win
        # bonuses (shield damage rewards like SMAC; regen can exceed this
        # slightly in long fights — the normalization is nominal)
        _type_health = jnp.asarray(self.TYPE_HEALTH)
        _type_shield = jnp.asarray(self.TYPE_SHIELD)
        self._enemy_total_health = float(
            (_type_health + _type_shield)[self.enemy_types].sum()
        )
        self._max_reward = (
            self._enemy_total_health + num_enemies * 0.5 + 1.0
        )

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array):
        k_a, k_e = jax.random.split(key)
        half = self.arena / 2
        ally_pos = jax.random.uniform(
            k_a, (self.num_allies, 2), minval=jnp.array([-half, -half]),
            maxval=jnp.array([-half / 2, half]),
        )
        enemy_pos = jax.random.uniform(
            k_e, (self.num_enemies, 2), minval=jnp.array([half / 2, -half]),
            maxval=jnp.array([half, half]),
        )
        type_health = jnp.asarray(self.TYPE_HEALTH)
        type_shield = jnp.asarray(self.TYPE_SHIELD)
        state = SkirmishState(
            ally_pos=ally_pos,
            ally_health=type_health[self.ally_types],
            ally_shield=type_shield[self.ally_types],
            ally_cd=jnp.zeros(self.num_allies, jnp.int32),
            ally_unhit=jnp.zeros(self.num_allies, jnp.int32),
            enemy_pos=enemy_pos,
            enemy_health=type_health[self.enemy_types],
            enemy_shield=type_shield[self.enemy_types],
            enemy_cd=jnp.zeros(self.num_enemies, jnp.int32),
            enemy_unhit=jnp.zeros(self.num_enemies, jnp.int32),
            time=jnp.asarray(0, jnp.int32),
        )
        return self.get_obs(state), state

    # ------------------------------------------------------------------
    @staticmethod
    def _apply_damage(shield, health, dmg):
        """Shields absorb first (SC2 rule); returns (shield, health,
        effective damage dealt — capped at what remained)."""
        absorbed = jnp.minimum(shield, dmg)
        overflow = dmg - absorbed
        new_health = jnp.maximum(health - overflow, 0.0)
        dealt = absorbed + (health - new_health)
        return shield - absorbed, new_health, dealt

    def _regen(self, shield, unhit, alive, types):
        """Shield regeneration after SHIELD_REGEN_DELAY unhit steps."""
        cap = jnp.asarray(self.TYPE_SHIELD)[types]
        regen_ok = alive & (unhit >= self.SHIELD_REGEN_DELAY)
        return jnp.where(
            regen_ok, jnp.minimum(shield + self.SHIELD_REGEN, cap), shield
        )

    def step(self, key: jax.Array, state: SkirmishState, actions: Dict):
        acts = jnp.stack([actions[a] for a in self.agents])  # (N,)
        ally_alive = state.ally_health > 0
        enemy_alive = state.enemy_health > 0

        a_range = jnp.asarray(self.TYPE_RANGE)[self.ally_types]
        a_damage = jnp.asarray(self.TYPE_DAMAGE)[self.ally_types]
        a_speed = jnp.asarray(self.TYPE_SPEED)[self.ally_types]
        e_range = jnp.asarray(self.TYPE_RANGE)[self.enemy_types]
        e_damage = jnp.asarray(self.TYPE_DAMAGE)[self.enemy_types]
        e_speed = jnp.asarray(self.TYPE_SPEED)[self.enemy_types]

        # -- ally movement (move actions 0..4; dead units frozen) -------
        move_idx = jnp.clip(acts, 0, 4) * (acts < 5)
        delta = _MOVES[move_idx] * a_speed[:, None]
        ally_pos = jnp.clip(
            state.ally_pos + delta * ally_alive[:, None],
            -self.arena, self.arena,
        )

        # -- ally attacks (action 5+j attacks enemy j) -------------------
        dists = jnp.linalg.norm(
            ally_pos[:, None, :] - state.enemy_pos[None, :, :], axis=-1
        )  # (N, M)
        target = jnp.clip(acts - 5, 0, self.num_enemies - 1)
        wants_attack = acts >= 5
        can_attack = (
            wants_attack
            & ally_alive
            & (state.ally_cd == 0)
            & enemy_alive[target]
            & (dists[jnp.arange(self.num_allies), target] <= a_range)
        )
        dmg_matrix = (
            jax.nn.one_hot(target, self.num_enemies)
            * (can_attack * a_damage)[:, None]
        )  # (N, M)
        enemy_damage = dmg_matrix.sum(axis=0)
        enemy_shield, enemy_health, dealt = self._apply_damage(
            state.enemy_shield, state.enemy_health, enemy_damage
        )
        killed = (state.enemy_health > 0) & (enemy_health <= 0)
        ally_cd = jnp.where(
            can_attack, self.attack_cooldown, jnp.maximum(state.ally_cd - 1, 0)
        )

        # -- enemy heuristic: chase closest living ally, attack in range -
        ally_alive_f = state.ally_health > 0
        e_dists = jnp.linalg.norm(
            state.enemy_pos[:, None, :] - ally_pos[None, :, :], axis=-1
        )  # (M, N)
        e_dists_masked = jnp.where(ally_alive_f[None, :], e_dists, 1e9)
        closest = jnp.argmin(e_dists_masked, axis=1)  # (M,)
        closest_dist = e_dists_masked[jnp.arange(self.num_enemies), closest]
        new_enemy_alive = enemy_health > 0

        chase_dir = ally_pos[closest] - state.enemy_pos
        chase_norm = jnp.linalg.norm(chase_dir, axis=-1, keepdims=True) + 1e-8
        enemy_pos = jnp.where(
            (new_enemy_alive & (closest_dist > e_range * 0.8))[:, None],
            state.enemy_pos + chase_dir / chase_norm * e_speed[:, None],
            state.enemy_pos,
        )
        enemy_pos = jnp.clip(enemy_pos, -self.arena, self.arena)

        e_attacks = (
            new_enemy_alive
            & (state.enemy_cd == 0)
            & (closest_dist <= e_range)
            & ally_alive_f[closest]
        )
        ally_damage = (
            jax.nn.one_hot(closest, self.num_allies)
            * (e_attacks * e_damage)[:, None]
        ).sum(axis=0)
        ally_shield, ally_health, _ = self._apply_damage(
            state.ally_shield, state.ally_health, ally_damage
        )
        enemy_cd = jnp.where(
            e_attacks, self.attack_cooldown, jnp.maximum(state.enemy_cd - 1, 0)
        )

        # -- shield regen / unhit counters -------------------------------
        ally_unhit = jnp.where(ally_damage > 0, 0, state.ally_unhit + 1)
        enemy_unhit = jnp.where(enemy_damage > 0, 0, state.enemy_unhit + 1)
        ally_shield = self._regen(
            ally_shield, ally_unhit, ally_health > 0, self.ally_types
        )
        enemy_shield = self._regen(
            enemy_shield, enemy_unhit, enemy_health > 0, self.enemy_types
        )

        # -- reward (SMAC-style shaped, normalized to ~[0, 1] total;
        #    shield damage counts, overkill doesn't) ----------------------
        all_enemies_dead = (enemy_health <= 0).all()
        reward = (
            dealt.sum()
            + 0.5 * killed.sum()
            + 1.0 * all_enemies_dead.astype(jnp.float32)
        ) / self._max_reward

        new_time = state.time + 1
        all_allies_dead = (ally_health <= 0).all()
        done = all_enemies_dead | all_allies_dead | (new_time >= self.max_steps)

        stepped = SkirmishState(
            ally_pos=ally_pos,
            ally_health=ally_health,
            ally_shield=ally_shield,
            ally_cd=ally_cd,
            ally_unhit=ally_unhit,
            enemy_pos=enemy_pos,
            enemy_health=enemy_health,
            enemy_shield=enemy_shield,
            enemy_cd=enemy_cd,
            enemy_unhit=enemy_unhit,
            time=new_time,
        )
        obs_re, state_re = self.reset(key)
        new_state = jax.tree_util.tree_map(
            lambda re, st: jax.lax.select(done, re, st), state_re, stepped
        )
        obs_st = self.get_obs(stepped)
        obs = jax.tree_util.tree_map(
            lambda re, st: jax.lax.select(done, re, st), obs_re, obs_st
        )

        rewards = {a: reward for a in self.agents}
        rewards["__all__"] = reward
        dones = {a: done for a in self.agents}
        dones["__all__"] = done
        info = {"won_episode": all_enemies_dead.astype(jnp.float32)}
        return obs, new_state, rewards, dones, info

    # ------------------------------------------------------------------
    def get_obs(self, state: SkirmishState) -> Dict:
        """Per-agent observations, built for ALL agents in one batched
        (N, U, 6) pass: the per-agent/per-unit Python loops this replaces
        emitted ~50 small op chains (hundreds of kernels per env step —
        the step was dispatch-bound on TPU); same feature values and
        ordering (own 6 | allies j!=i | enemies), bit-identical math."""
        ally_alive = (state.ally_health > 0).astype(jnp.float32)
        enemy_alive = (state.enemy_health > 0).astype(jnp.float32)

        a_types = self.ally_types.astype(jnp.float32)
        e_types = self.enemy_types.astype(jnp.float32)
        a_sight = jnp.asarray(self.TYPE_SIGHT)[self.ally_types]

        own = jnp.concatenate(
            [
                state.ally_pos / self.arena,
                (state.ally_health / self.max_health)[:, None],
                (state.ally_shield / self.max_shield)[:, None],
                (state.ally_cd / self.attack_cooldown)[:, None],
                a_types[:, None],
            ],
            axis=1,
        )  # (N, 6)

        # all units (allies then enemies) observed by all agents at once
        upos = jnp.concatenate([state.ally_pos, state.enemy_pos], axis=0)
        uhealth = jnp.concatenate([state.ally_health, state.enemy_health])
        ushield = jnp.concatenate([state.ally_shield, state.enemy_shield])
        ualive = jnp.concatenate([ally_alive, enemy_alive])
        utype = jnp.concatenate([a_types, e_types])

        rel = upos[None, :, :] - state.ally_pos[:, None, :]   # (N, U, 2)
        dist = jnp.linalg.norm(rel, axis=-1)                  # (N, U)
        # sight gating: units beyond my sight radius read as zeros
        vis = ualive[None, :] * (dist <= a_sight[:, None]).astype(jnp.float32)
        feats = jnp.concatenate(
            [
                rel / self.arena * vis[..., None],
                (uhealth[None, :] / self.max_health * vis)[..., None],
                (ushield[None, :] / self.max_shield * vis)[..., None],
                vis[..., None],
                (utype[None, :] * vis)[..., None],
            ],
            axis=-1,
        )  # (N, U, 6)

        # drop unit i from agent i's row (static indices -> one gather)
        n, u = self.num_allies, self.num_allies + self.num_enemies
        idx = np.stack(
            [[j for j in range(u) if j != i] for i in range(n)]
        )
        sel = feats[jnp.arange(n)[:, None], jnp.asarray(idx)]  # (N, U-1, 6)
        obs = jnp.concatenate([own, sel.reshape(n, -1)], axis=1)
        return {a: obs[i] for i, a in enumerate(self.agents)}

    def get_avail_actions(self, state: SkirmishState) -> Dict:
        dists = jnp.linalg.norm(
            state.ally_pos[:, None, :] - state.enemy_pos[None, :, :], axis=-1
        )
        a_range = jnp.asarray(self.TYPE_RANGE)[self.ally_types]
        attackable = (
            (state.enemy_health > 0)[None, :]
            & (dists <= a_range[:, None])
        )  # (N, M)
        moves = jnp.ones((self.num_allies, 5))
        mask = jnp.concatenate([moves, attackable.astype(jnp.float32)], axis=1)
        # dead allies: only noop
        dead = state.ally_health <= 0
        noop_only = jnp.zeros_like(mask).at[:, 0].set(1.0)
        mask = jnp.where(dead[:, None], noop_only, mask)
        return {a: mask[i] for i, a in enumerate(self.agents)}

    def observation_space(self, agent: str) -> spaces.Box:
        return spaces.Box(-2.0, 2.0, (self.obs_dim,), jnp.float32)

    def action_space(self, agent: str) -> spaces.Discrete:
        return spaces.Discrete(self.num_actions)
