"""Forager: a craftax-class open-world survival/crafting environment in
pure JAX.

This is the framework's in-tree counterpart of the Craftax/Crafter family
the reference trains on (`ENV_NAME: Craftax-Symbolic-v1`,
/root/reference/purejaxql/config/alg/pqn_craftax.yaml): procedurally
generated worlds (expensive resets -> pairs with OptimisticResetVecEnv),
resource gathering gated by tool tiers, crafting at stations, hunger /
thirst / energy / health survival dynamics, day-night cycles with hostile
mobs, a five-floor dungeon (craftax-style vertical depth: aligned ladder
pairs descend surface -> cave -> deep -> hell -> ice realm, each floor
with richer ore veins and tougher mobs than the one above; ruby and
sapphire spawn only on the deep floor, which orcs patrol and a lone
high-health WARDEN boss guards; the hell floor is obsidian and lava seas
where demons prowl and the NECROMANCER waits; the frozen ice realm at the
very bottom holds the enchanting crystal ore, wraiths, and the ICE QUEEN
final boss), a diamond tool tier above iron, bow-and-arrow ranged combat
(craftax's bow: craft at a table, fire down the facing ray, first mob in
line-of-sight takes heavy damage), loot chests holding potions whose
color -> effect mapping is re-permuted every episode (craftax's
potion-experimentation mechanic), a two-spell magic system (a mana-fueled
fireball from spellbook chest drops, and a piercing ice bolt from the ice
realm's frost tome), gem enchanting at placeable enchantment tables
(ruby -> sword, sapphire -> bow, crystal -> armor — craftax's enchantment
mechanic), placeable torches, iron/diamond armor tiers that blunt melee
damage, a kill-XP player-level ladder that raises melee damage, and a
65-achievement reward structure (+1 on each first-time achievement per
episode, +-0.1 per health point gained/lost) — the same tree size as
craftax-1.0 — including derived feats (marksman long shots, fireball/ice
kills, collecting every gem type, tasting every potion, crafting every
tool, slaying all three bosses, levelling to veteran).

Observations are symbolic (craftax-symbolic-style): a flattened float32
vector of a 9x9 one-hot local block/mob view plus inventory, needs + mana,
facing, time-of-day, sleep state, XP level, and potions-tried bits. 34
discrete actions (noop, 4 moves, do, sleep, 6 places, 12 crafts incl.
armor, 3 enchants, shoot, 3 drinks, 2 casts). The potion permutation is
hidden state the agent cannot observe — only taste.

Everything is branchless jnp.where logic over static-shape arrays: the
whole step is a handful of fused gather/compare ops, and worlds vmap to
thousands of parallel instances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment
from purejaxql_tpu.envs.gridworld import worldgen as W

ACHIEVEMENTS = [
    "collect_wood", "place_table", "eat_cow", "collect_sapling",
    "collect_drink", "make_wood_pickaxe", "make_wood_sword", "place_plant",
    "defeat_zombie", "collect_stone", "place_stone", "eat_plant",
    "defeat_skeleton", "collect_coal", "make_stone_pickaxe",
    "make_stone_sword", "wake_up", "place_furnace", "collect_iron",
    "make_iron_pickaxe", "make_iron_sword", "collect_diamond", "enter_cave",
    "enter_deep", "collect_ruby", "collect_sapphire",
    "make_diamond_pickaxe", "make_diamond_sword", "make_bow", "make_arrow",
    "fire_bow", "defeat_orc", "defeat_warden", "enter_hell",
    "collect_obsidian", "open_chest", "drink_potion", "learn_spell",
    "cast_spell", "defeat_demon", "defeat_necromancer",
    "make_iron_armor", "make_diamond_armor", "fireball_kill", "marksman",
    "collect_all_gems", "slay_all_bosses", "full_belly",
    # tier-4 content: torches, the ice realm, enchanting, a second spell,
    # an XP ladder, and completionist feats — 65 total, matching the size
    # of craftax-1.0's achievement tree
    "place_torch", "place_enchant_table", "enchant_sword", "enchant_bow",
    "enchant_armor", "enter_ice", "collect_crystal", "defeat_bat",
    "defeat_wraith", "defeat_ice_queen", "learn_ice_spell",
    "cast_ice_spell", "ice_kill", "drink_all_potions", "level_up",
    "veteran", "craft_all_tools",
]
NUM_ACHIEVEMENTS = len(ACHIEVEMENTS)
_ACH = {name: i for i, name in enumerate(ACHIEVEMENTS)}

# ---- unified mob table ------------------------------------------------
# Every mob species lives in ONE (N_MOBS, ...) table with a static
# per-slot type, so combat, archery, movement, adjacency damage and the
# obs mob channels are each a single batched gather/compare over all 29
# mobs instead of five small per-species op chains. On TPU the per-op
# dispatch of tiny (8,)-shaped ops dominates an env step at 1024 envs;
# one (29,)-shaped op chain is ~5x fewer ops for the same work.
(
    MOB_COW, MOB_ZOMBIE, MOB_SKEL, MOB_ORC, MOB_WARDEN, MOB_DEMON,
    MOB_NECRO, MOB_BAT, MOB_WRAITH, MOB_QUEEN,
) = range(10)
NUM_MOB_TYPES = 10
N_COWS = 8
N_ZOMBIES = 8   # spawn at night near the player / anywhere in the dungeon
N_SKELETONS = 8  # haunt the cave and deep floors (level per skeleton)
N_ORCS = 4       # tier-2 melee mobs patrolling the deep floor
N_DEMONS = 4     # tier-3 mobs prowling the hell floor
N_BATS = 4       # weak erratic cave-fliers
N_WRAITHS = 4    # tier-4 mobs haunting the ice realm
COWS = slice(0, 8)      # slot layout is static: per-type logic (zombie
ZOMBIES = slice(8, 16)  # spawning) uses static slices, everything else
SKELS = slice(16, 24)   # is type-indexed through MOB_TYPE
ORCS = slice(24, 28)
WARDEN = 28             # the lone deep-floor boss
DEMONS = slice(29, 33)
NECRO = 33              # the necromancer: the hell-floor boss
BATS = slice(34, 38)
WRAITHS = slice(38, 42)
QUEEN = 42              # the ice queen: the final boss at the very bottom
N_MOBS = 43
MOB_TYPE = jnp.array(
    [MOB_COW] * N_COWS + [MOB_ZOMBIE] * N_ZOMBIES + [MOB_SKEL] * N_SKELETONS
    + [MOB_ORC] * N_ORCS + [MOB_WARDEN] + [MOB_DEMON] * N_DEMONS
    + [MOB_NECRO] + [MOB_BAT] * N_BATS + [MOB_WRAITH] * N_WRAITHS
    + [MOB_QUEEN]
)
_TYPE_ONEHOT = MOB_TYPE[:, None] == jnp.arange(NUM_MOB_TYPES)[None, :]
_SPAWN_HEALTH = jnp.array([3, 5, 3, 8, 20, 10, 30, 1, 8, 30], jnp.int32)
_MELEE_DMG = jnp.array([0, 1, 1, 2, 3, 3, 4, 1, 3, 4], jnp.int32)
# chance per step of taking a chase step toward the player (only while on
# the player's floor); the warden, necromancer and queen chase relentlessly
_CHASE_P = jnp.array(
    [0.0, 0.7, 0.0, 0.6, 1.0, 0.8, 1.0, 0.3, 0.8, 1.0], jnp.float32
)
# random-walk chance while sharing the player's floor / while elsewhere
# (orcs, demons and wraiths patrol their floor only when the player is
# away; zombies and the bosses never wander; bats flit constantly)
_WALK_P_SAME = jnp.array(
    [0.3, 0.0, 0.2, 0.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0], jnp.float32
)
_WALK_P_AWAY = jnp.array(
    [0.3, 0.0, 0.2, 0.25, 0.0, 0.25, 0.0, 0.5, 0.25, 0.0], jnp.float32
)
# first-kill achievement id per mob type (a cow kill feeds you)
_MOB_ACH_IDS = jnp.array(
    [
        _ACH["eat_cow"], _ACH["defeat_zombie"], _ACH["defeat_skeleton"],
        _ACH["defeat_orc"], _ACH["defeat_warden"], _ACH["defeat_demon"],
        _ACH["defeat_necromancer"], _ACH["defeat_bat"],
        _ACH["defeat_wraith"], _ACH["defeat_ice_queen"],
    ]
)
_MOB_ACH_ONEHOT = (
    _MOB_ACH_IDS[:, None] == jnp.arange(NUM_ACHIEVEMENTS)[None, :]
)
# XP granted per kill by mob type (craftax's experience system): trash
# mobs 1, tier mobs 2, bosses 5; cows are food, not XP
_XP_PER_KILL = jnp.array([0, 1, 1, 2, 5, 2, 5, 1, 2, 5], jnp.int32)
XP_PER_LEVEL = 8    # player level = 1 + xp // XP_PER_LEVEL, capped
MAX_PLAYER_LEVEL = 5  # each level past 1 adds +1 melee damage

# derived-achievement rows (order matches the `derived` stack in step_env)
_DERIVED_IDS = [
    _ACH["fireball_kill"], _ACH["marksman"], _ACH["collect_all_gems"],
    _ACH["slay_all_bosses"], _ACH["full_belly"], _ACH["ice_kill"],
    _ACH["drink_all_potions"], _ACH["level_up"], _ACH["veteran"],
    _ACH["craft_all_tools"],
]
_DERIVED_ONEHOT = (
    jnp.arange(NUM_ACHIEVEMENTS)[None, :] == jnp.array(_DERIVED_IDS)[:, None]
)

# inventory slots
INV = {
    "wood": 0, "stone": 1, "coal": 2, "iron": 3, "diamond": 4, "sapling": 5,
    "wood_pickaxe": 6, "stone_pickaxe": 7, "iron_pickaxe": 8,
    "wood_sword": 9, "stone_sword": 10, "iron_sword": 11, "ruby": 12,
    "diamond_pickaxe": 13, "diamond_sword": 14, "bow": 15, "arrow": 16,
    "sapphire": 17, "obsidian": 18,
    # potion colors MUST stay consecutive (drink actions index off red)
    "potion_red": 19, "potion_green": 20, "potion_blue": 21,
    "spellbook": 22, "iron_armor": 23, "diamond_armor": 24,
    # tier-4: the enchanting reagent, the ice-spell tome, and the three
    # 0/1 enchantment marks (enchanted gear is an upgraded inventory bit,
    # not a separate item — the sword/bow/armor slots stay canonical)
    "crystal": 25, "frost_tome": 26,
    "sword_enchant": 27, "bow_enchant": 28, "armor_enchant": 29,
}
NUM_INV = 30

# actions
A_NOOP, A_LEFT, A_RIGHT, A_UP, A_DOWN, A_DO, A_SLEEP = range(7)
A_PLACE_STONE, A_PLACE_TABLE, A_PLACE_FURNACE, A_PLACE_PLANT = 7, 8, 9, 10
A_MAKE_WP, A_MAKE_SP, A_MAKE_IP, A_MAKE_WS, A_MAKE_SS, A_MAKE_IS = range(11, 17)
A_MAKE_DP, A_MAKE_DS, A_MAKE_BOW, A_MAKE_ARROW, A_SHOOT = range(17, 22)
A_DRINK_RED, A_DRINK_GREEN, A_DRINK_BLUE, A_CAST = range(22, 26)
A_MAKE_IA, A_MAKE_DA = 26, 27  # armor crafts
A_PLACE_TORCH, A_PLACE_ENCHANT = 28, 29
A_ENCH_SWORD, A_ENCH_BOW, A_ENCH_ARMOR, A_CAST_ICE = range(30, 34)
NUM_ACTIONS = 34

ARROW_RANGE = 5   # tiles along the facing ray
ARROW_DAMAGE = 3
ARROWS_PER_CRAFT = 3
MAX_ARROWS = 9

# potions: each chest holds a random color; the color -> effect mapping is
# PERMUTED PER EPISODE (craftax's potion mechanic: the agent must
# experiment each life). Effect ids: 0 heal +4, 1 feast (+4 food +4
# drink), 2 poison (-2 health).
NUM_POTIONS = 3
POTION_HEAL, POTION_FEAST, POTION_POISON = range(3)

# magic: a spellbook (chest loot) unlocks the fireball spell — same ray as
# the bow but heavier damage, paid in mana that trickles back over time.
# The frost tome (ice-realm chest loot) unlocks the ice bolt: cheaper,
# lighter damage, but PIERCING — it strikes every mob along the ray.
SPELL_COST = 4
SPELL_DAMAGE = 5
ICE_COST = 2
ICE_DAMAGE = 3
MAX_MANA = 9
# enchanting (craftax's gem-enchantment system): at a placed enchantment
# table, a gem + mana upgrades a piece of gear once per episode —
# ruby -> sword (+2 melee), sapphire -> bow (+2 arrow), crystal -> armor
# (+1 protection)
ENCHANT_COST = 3  # mana per enchantment


# ---- table-driven interactions ----------------------------------------
# Crafting, placing, and enchanting each fold into ONE vectorized pass
# over a static spec table (like the mob table above): per-recipe Python
# chains each lowered to their own where/scatter kernels, and at 1024
# envs the step is kernel-dispatch-bound — a (N_RECIPES, NUM_INV) compare
# + masked-sum is the same work in ~6 fused ops.
def _cost_row(costs):
    row = [0] * NUM_INV
    for item, n in costs:
        row[INV[item]] = n
    return row


# (action, output slot, costs, needs furnace, achievement)
_CRAFT_SPECS = [
    (A_MAKE_WP, "wood_pickaxe", [("wood", 1)], False, "make_wood_pickaxe"),
    (A_MAKE_SP, "stone_pickaxe", [("wood", 1), ("stone", 1)], False,
     "make_stone_pickaxe"),
    (A_MAKE_IP, "iron_pickaxe", [("wood", 1), ("coal", 1), ("iron", 1)],
     True, "make_iron_pickaxe"),
    (A_MAKE_WS, "wood_sword", [("wood", 1)], False, "make_wood_sword"),
    (A_MAKE_SS, "stone_sword", [("wood", 1), ("stone", 1)], False,
     "make_stone_sword"),
    (A_MAKE_IS, "iron_sword", [("wood", 1), ("coal", 1), ("iron", 1)],
     True, "make_iron_sword"),
    (A_MAKE_DP, "diamond_pickaxe", [("wood", 1), ("diamond", 2)], True,
     "make_diamond_pickaxe"),
    (A_MAKE_DS, "diamond_sword", [("wood", 1), ("diamond", 1)], True,
     "make_diamond_sword"),
    (A_MAKE_BOW, "bow", [("wood", 2)], False, "make_bow"),
    (A_MAKE_IA, "iron_armor", [("iron", 3), ("coal", 1)], True,
     "make_iron_armor"),
    (A_MAKE_DA, "diamond_armor", [("diamond", 2), ("iron", 1)], True,
     "make_diamond_armor"),
]
_CRAFT_ACT = jnp.array([s[0] for s in _CRAFT_SPECS])
_CRAFT_OUT = jnp.array([INV[s[1]] for s in _CRAFT_SPECS])
_CRAFT_OUT_ONEHOT = _CRAFT_OUT[:, None] == jnp.arange(NUM_INV)[None, :]
_CRAFT_COST = jnp.array([_cost_row(s[2]) for s in _CRAFT_SPECS], jnp.int32)
_CRAFT_FURNACE = jnp.array([s[3] for s in _CRAFT_SPECS])
_CRAFT_NAMES = [s[4] for s in _CRAFT_SPECS]

# (action, placed block, costs, needs grass, achievement)
_PLACE_SPECS = [
    (A_PLACE_STONE, W.STONE, [("stone", 1)], False, "place_stone"),
    (A_PLACE_TABLE, W.TABLE, [("wood", 2)], False, "place_table"),
    (A_PLACE_FURNACE, W.FURNACE, [("stone", 2)], False, "place_furnace"),
    (A_PLACE_PLANT, W.SAPLING, [("sapling", 1)], True, "place_plant"),
    (A_PLACE_TORCH, W.TORCH, [("wood", 1), ("coal", 1)], False,
     "place_torch"),
    (A_PLACE_ENCHANT, W.ENCHANT_TABLE, [("stone", 1), ("diamond", 1)],
     False, "place_enchant_table"),
]
_PLACE_ACT = jnp.array([s[0] for s in _PLACE_SPECS])
_PLACE_TILE = jnp.array([s[1] for s in _PLACE_SPECS], jnp.int32)
_PLACE_COST = jnp.array([_cost_row(s[2]) for s in _PLACE_SPECS], jnp.int32)
_PLACE_GRASS = jnp.array([s[3] for s in _PLACE_SPECS])
_PLACE_NAMES = [s[4] for s in _PLACE_SPECS]
_PLACE_PLANT_ROW = 3  # growth logic needs the plant row's ok flag

# (action, enchant mark slot, gem slot, achievement); the gear
# requirement per row is computed in-step (sword/bow/armor presence)
_ENCH_SPECS = [
    (A_ENCH_SWORD, "sword_enchant", "ruby", "enchant_sword"),
    (A_ENCH_BOW, "bow_enchant", "sapphire", "enchant_bow"),
    (A_ENCH_ARMOR, "armor_enchant", "crystal", "enchant_armor"),
]
_ENCH_ACT = jnp.array([s[0] for s in _ENCH_SPECS])
_ENCH_MARK = jnp.array([INV[s[1]] for s in _ENCH_SPECS])
_ENCH_GEM = jnp.array([INV[s[2]] for s in _ENCH_SPECS])
# +mark, -gem in one add
_ENCH_DELTA = (
    (_ENCH_MARK[:, None] == jnp.arange(NUM_INV)[None, :]).astype(jnp.int32)
    - (_ENCH_GEM[:, None] == jnp.arange(NUM_INV)[None, :]).astype(jnp.int32)
)
_ENCH_NAMES = [s[3] for s in _ENCH_SPECS]

# mined-resource collection: cond order is fixed in step_env
_COLLECT_ITEMS = [
    "wood", "sapling", "stone", "coal", "iron", "diamond", "ruby",
    "sapphire", "obsidian", "crystal",
]
_COLLECT_ONEHOT = jnp.array(
    [_cost_row([(i, 1)]) for i in _COLLECT_ITEMS], jnp.int32
)

# direction vectors: 0 up, 1 right, 2 down, 3 left (dy, dx)
_DIRS = jnp.array([[-1, 0], [0, 1], [1, 0], [0, -1]])

_WALKABLE = jnp.zeros(W.NUM_BLOCK_TYPES, bool).at[
    jnp.array([W.GRASS, W.SAND, W.PATH, W.SAPLING, W.PLANT_RIPE, W.ICE])
].set(True)
_PLACEABLE = jnp.zeros(W.NUM_BLOCK_TYPES, bool).at[
    jnp.array([W.GRASS, W.SAND, W.PATH, W.ICE])
].set(True)

VIEW = 9  # local obs window
# grid channels: one-hot blocks + one channel per mob type; extras are
# inventory, needs (health/food/drink/energy) + mana, facing one-hot,
# time-of-day sin/cos, sleeping flag, floor depth, player level + XP
# progress, and the potions-tried bits (which colors this life has tasted
# — the potion permutation itself stays hidden)
OBS_DIM = (
    VIEW * VIEW * (W.NUM_BLOCK_TYPES + NUM_MOB_TYPES)
    + NUM_INV + 5 + 4 + 2 + 1 + 1 + 2 + NUM_POTIONS
)


@struct.dataclass
class ForagerState:
    blocks: jax.Array          # (NUM_LEVELS, 56, 56) int8 floor stack
    growth: jax.Array          # (56, 56) int8 sapling growth timers
                               # (surface only: saplings need grass)
    pos: jax.Array             # (2,) int32 (y, x) in padded coords
    level: jax.Array           # int32: 0 surface, 1 cave, 2 deep
    facing: jax.Array          # int32 0..3
    health: jax.Array
    food: jax.Array
    drink: jax.Array
    energy: jax.Array
    hunger: jax.Array          # accumulators
    thirst: jax.Array
    fatigue: jax.Array
    decay_tick: jax.Array
    regen_tick: jax.Array
    sleeping: jax.Array
    mana: jax.Array            # int32 spell fuel, regenerates over time
    xp: jax.Array              # int32 experience from kills
    potion_map: jax.Array      # (3,) per-episode color -> effect permutation
    potions_tried: jax.Array   # (3,) bool: colors tasted this episode
    inventory: jax.Array       # (NUM_INV,) int32
    achievements: jax.Array    # (NUM_ACHIEVEMENTS,) bool
    mob_pos: jax.Array         # (N_MOBS, 2) padded coords; slots by type
    mob_level: jax.Array       # (N_MOBS,) which floor each mob is on
    mob_alive: jax.Array       # (N_MOBS,) bool
    mob_health: jax.Array      # (N_MOBS,) int32
    time: jax.Array
    terminal: jax.Array


@struct.dataclass
class ForagerParams:
    day_length: int = struct.field(pytree_node=False, default=300)
    growth_time: int = struct.field(pytree_node=False, default=60)
    max_steps_in_episode: int = struct.field(pytree_node=False, default=10000)


class Forager(Environment):
    def __init__(self, log_achievements: bool = False):
        # Per-achievement info keys (33 extra scalars per step) are opt-in,
        # mirroring the reference's LOG_ACHIEVEMENTS flag
        # (pqn_craftax.py:384-387).
        self.log_achievements = log_achievements

    @property
    def default_params(self) -> ForagerParams:
        return ForagerParams()

    @property
    def name(self) -> str:
        return "Forager-v0"

    # ------------------------------------------------------------------
    def reset_env(self, key, params):
        (
            k_world, k_cow, k_skel, k_orc, k_warden, k_demon, k_necro,
            k_potion, k_bat, k_wraith, k_queen,
        ) = jax.random.split(key, 11)
        blocks = W.generate_world(k_world)
        c = W.PAD + W.WORLD_SIZE // 2

        # cows on random tiles (prefer grass via rejection-free weighting);
        # all positions live in padded coordinates
        cow_pos = jax.random.randint(
            k_cow, (N_COWS, 2), W.PAD + 4, W.PAD + W.WORLD_SIZE - 4
        )
        on_grass = blocks[W.SURFACE, cow_pos[:, 0], cow_pos[:, 1]] == W.GRASS
        skel_pos = jax.random.randint(
            k_skel, (N_SKELETONS, 2), W.PAD + 2, W.PAD + W.WORLD_SIZE - 2
        )
        # skeletons haunt the dungeon passages: half on the cave floor,
        # half on the deep floor (deep is denser per open tile)
        skel_level = jnp.where(
            jnp.arange(N_SKELETONS) % 2 == 0, W.CAVE, W.DEEP
        ).astype(jnp.int32)
        on_open_floor = (
            blocks[skel_level, skel_pos[:, 0], skel_pos[:, 1]] == W.PATH
        )

        # orcs patrol the deep floor; the warden guards a deep chamber.
        # 8 candidate cells per mob, first open one wins (the deep floor
        # is ~45% open, so P(all 8 closed) < 1%)
        orc_cands = jax.random.randint(
            k_orc, (N_ORCS, 8, 2), W.PAD + 2, W.PAD + W.WORLD_SIZE - 2
        )
        orc_cand_open = (
            blocks[W.DEEP, orc_cands[..., 0], orc_cands[..., 1]] == W.PATH
        )
        orc_pick = jnp.argmax(orc_cand_open, axis=1)
        orc_pos = jnp.take_along_axis(
            orc_cands, orc_pick[:, None, None], axis=1
        )[:, 0]
        orc_open = jnp.take_along_axis(
            orc_cand_open, orc_pick[:, None], axis=1
        )[:, 0]
        warden_cands = jax.random.randint(
            k_warden, (8, 2), W.PAD + 4, W.PAD + W.WORLD_SIZE - 4
        )
        warden_cand_open = (
            blocks[W.DEEP, warden_cands[:, 0], warden_cands[:, 1]] == W.PATH
        )
        warden_pick = jnp.argmax(warden_cand_open)
        warden_pos = warden_cands[warden_pick]
        warden_open = warden_cand_open[warden_pick]

        # demons prowl the hell floor; the necromancer guards its depths
        demon_cands = jax.random.randint(
            k_demon, (N_DEMONS, 8, 2), W.PAD + 2, W.PAD + W.WORLD_SIZE - 2
        )
        demon_cand_open = (
            blocks[W.HELL, demon_cands[..., 0], demon_cands[..., 1]] == W.PATH
        )
        demon_pick = jnp.argmax(demon_cand_open, axis=1)
        demon_pos = jnp.take_along_axis(
            demon_cands, demon_pick[:, None, None], axis=1
        )[:, 0]
        demon_open = jnp.take_along_axis(
            demon_cand_open, demon_pick[:, None], axis=1
        )[:, 0]
        necro_cands = jax.random.randint(
            k_necro, (8, 2), W.PAD + 4, W.PAD + W.WORLD_SIZE - 4
        )
        necro_cand_open = (
            blocks[W.HELL, necro_cands[:, 0], necro_cands[:, 1]] == W.PATH
        )
        necro_pick = jnp.argmax(necro_cand_open)
        necro_pos = necro_cands[necro_pick]
        necro_open = necro_cand_open[necro_pick]

        # bats flit through the cave passages; wraiths haunt the frozen
        # ground of the ice realm, where the ICE QUEEN waits at the bottom
        bat_pos = jax.random.randint(
            k_bat, (N_BATS, 2), W.PAD + 2, W.PAD + W.WORLD_SIZE - 2
        )
        bat_open = blocks[W.CAVE, bat_pos[:, 0], bat_pos[:, 1]] == W.PATH
        wraith_cands = jax.random.randint(
            k_wraith, (N_WRAITHS, 8, 2), W.PAD + 2, W.PAD + W.WORLD_SIZE - 2
        )
        wraith_cand_open = (
            blocks[W.ICE_REALM, wraith_cands[..., 0], wraith_cands[..., 1]]
            == W.ICE
        )
        wraith_pick = jnp.argmax(wraith_cand_open, axis=1)
        wraith_pos = jnp.take_along_axis(
            wraith_cands, wraith_pick[:, None, None], axis=1
        )[:, 0]
        wraith_open = jnp.take_along_axis(
            wraith_cand_open, wraith_pick[:, None], axis=1
        )[:, 0]
        queen_cands = jax.random.randint(
            k_queen, (8, 2), W.PAD + 4, W.PAD + W.WORLD_SIZE - 4
        )
        queen_cand_open = (
            blocks[W.ICE_REALM, queen_cands[:, 0], queen_cands[:, 1]]
            == W.ICE
        )
        queen_pick = jnp.argmax(queen_cand_open)
        queen_pos = queen_cands[queen_pick]
        queen_open = queen_cand_open[queen_pick]

        mob_pos = jnp.concatenate(
            [
                cow_pos.astype(jnp.int32),
                jnp.zeros((N_ZOMBIES, 2), jnp.int32),  # zombies spawn later
                skel_pos.astype(jnp.int32),
                orc_pos.astype(jnp.int32),
                warden_pos.astype(jnp.int32)[None],
                demon_pos.astype(jnp.int32),
                necro_pos.astype(jnp.int32)[None],
                bat_pos.astype(jnp.int32),
                wraith_pos.astype(jnp.int32),
                queen_pos.astype(jnp.int32)[None],
            ]
        )
        mob_level = jnp.concatenate(
            [
                jnp.full(N_COWS, W.SURFACE, jnp.int32),
                jnp.zeros(N_ZOMBIES, jnp.int32),
                skel_level,
                jnp.full(N_ORCS, W.DEEP, jnp.int32),
                jnp.asarray([W.DEEP], jnp.int32),
                jnp.full(N_DEMONS, W.HELL, jnp.int32),
                jnp.asarray([W.HELL], jnp.int32),
                jnp.full(N_BATS, W.CAVE, jnp.int32),
                jnp.full(N_WRAITHS, W.ICE_REALM, jnp.int32),
                jnp.asarray([W.ICE_REALM], jnp.int32),
            ]
        )
        mob_alive = jnp.concatenate(
            [
                on_grass,
                jnp.zeros(N_ZOMBIES, bool),
                on_open_floor,
                orc_open,
                warden_open[None],
                demon_open,
                necro_open[None],
                bat_open,
                wraith_open,
                queen_open[None],
            ]
        )

        state = ForagerState(
            blocks=blocks,
            growth=jnp.zeros_like(blocks[W.SURFACE]),
            pos=jnp.array([c, c], jnp.int32),
            level=jnp.asarray(W.SURFACE, jnp.int32),
            facing=jnp.asarray(2, jnp.int32),
            health=jnp.asarray(9, jnp.int32),
            food=jnp.asarray(9, jnp.int32),
            drink=jnp.asarray(9, jnp.int32),
            energy=jnp.asarray(9, jnp.int32),
            hunger=jnp.asarray(0, jnp.int32),
            thirst=jnp.asarray(0, jnp.int32),
            fatigue=jnp.asarray(0, jnp.int32),
            decay_tick=jnp.asarray(0, jnp.int32),
            regen_tick=jnp.asarray(0, jnp.int32),
            sleeping=jnp.asarray(False),
            mana=jnp.asarray(0, jnp.int32),
            xp=jnp.asarray(0, jnp.int32),
            potion_map=jax.random.permutation(k_potion, NUM_POTIONS).astype(
                jnp.int32
            ),
            potions_tried=jnp.zeros(NUM_POTIONS, bool),
            inventory=jnp.zeros(NUM_INV, jnp.int32),
            achievements=jnp.zeros(NUM_ACHIEVEMENTS, bool),
            mob_pos=mob_pos,
            mob_level=mob_level,
            mob_alive=mob_alive,
            mob_health=_SPAWN_HEALTH[MOB_TYPE],
            time=jnp.asarray(0, jnp.int32),
            terminal=jnp.asarray(False),
        )
        return self.get_obs(state, params), state

    # ------------------------------------------------------------------
    def step_env(self, key, state, action, params):
        # ONE threefry invocation covers every stochastic decision in the
        # step (sapling/chest rolls, zombie spawns, all mob movement).
        # Separate jax.random calls each lower to their own hash kernel;
        # at 1024 envs the step is kernel-dispatch-bound, so ~11 draws
        # collapsing into one batched draw is a measurable win. The
        # static column layout below IS the env's random stream — append
        # new consumers at the end to keep old trajectories stable.
        u = jax.random.uniform(key, (26 + 3 * N_MOBS,))
        u_sap, u_chest = u[0], u[1]
        u_zoff = u[2:18].reshape(N_ZOMBIES, 2)
        u_zgate = u[18:26]
        u_dirs = u[26 : 26 + N_MOBS]
        u_chase = u[26 + N_MOBS : 26 + 2 * N_MOBS]
        u_walk = u[26 + 2 * N_MOBS : 26 + 3 * N_MOBS]
        old_health = state.health
        ach = state.achievements
        # Achievement grants are monotonic ORs nothing reads mid-step, so
        # they DEFER: each (static id, cond) pair lands in this list and
        # ONE masked OR at the end of the step commits them all. The
        # ~30 per-id .at[i].set() scatters this replaces were each their
        # own kernel dispatch — a large slice of the step's dispatch
        # budget at 1024 envs.
        grants = []

        def grant(name, cond):
            grants.append((_ACH[name], cond))

        inv = state.inventory
        blocks = state.blocks
        lvl = state.level

        # ---- local map patch (selector matmuls) ----------------------
        # Every player-centric map read this step lands within +-8 of the
        # incoming position (movement +-1, facing target +-2, craft
        # neighborhood +-2, arrow ray +-6, zombie spawn offsets +-8 after
        # their interior clip). TPU gathers run near-scalar (the same
        # finding as the obs window, get_obs below), so the patch is
        # extracted ONCE with one-hot selector matmuls and every read
        # becomes an exact one-hot contraction over (17, 17). Coordinates
        # outside the stored map hit all-zero selector rows and read
        # INVALID (=0) — identical to the clamped gather's INVALID-border
        # reads. Readers that run after this step's single tile write
        # override that cell with `tile_new` (see _patch_read call sites).
        _PR = 8
        dpatch = jnp.arange(-_PR, _PR + 1)
        lv_sel = jax.nn.one_hot(lvl, blocks.shape[0])
        level_map = jnp.einsum(
            "l,lyx->yx", lv_sel, blocks.astype(jnp.float32)
        )
        p_ry = jax.nn.one_hot(state.pos[0] + dpatch, blocks.shape[1])
        p_rx = jax.nn.one_hot(state.pos[1] + dpatch, blocks.shape[2])
        patch_f = p_ry @ level_map @ p_rx.T  # (17, 17), exact small ints

        def _patch_read(ys, xs):
            """blocks[lvl, ys, xs] for coords within +-_PR of state.pos."""
            oy = jax.nn.one_hot(ys - state.pos[0] + _PR, 2 * _PR + 1)
            ox = jax.nn.one_hot(xs - state.pos[1] + _PR, 2 * _PR + 1)
            return jnp.einsum(
                "...y,yx,...x->...", oy, patch_f, ox
            ).astype(jnp.int32)

        sleeping = jnp.logical_and(state.sleeping, action == A_NOOP)

        # ---- movement / facing ---------------------------------------
        is_move = jnp.logical_and(action >= A_LEFT, action <= A_DOWN)
        move_dir = jnp.where(
            action == A_UP, 0,
            jnp.where(action == A_RIGHT, 1,
                      jnp.where(action == A_DOWN, 2, 3)),
        )
        facing = jnp.where(is_move, move_dir, state.facing)
        step_vec = _DIRS[facing]
        new_pos = state.pos + step_vec  # border is INVALID: unwalkable
        target_walkable = _WALKABLE[_patch_read(new_pos[0], new_pos[1])]
        pos = jnp.where(jnp.logical_and(is_move, target_walkable), new_pos, state.pos)

        # facing target tile
        tgt = pos + _DIRS[facing]
        ty, tx = tgt[0], tgt[1]
        tblock = _patch_read(ty, tx)

        # ---- mob lookup at the target tile: one batched compare -------
        here = (
            state.mob_alive
            & (state.mob_level == lvl)
            & (state.mob_pos[:, 0] == ty)
            & (state.mob_pos[:, 1] == tx)
        )
        any_mob = here.any()

        # ---- DO action ----------------------------------------------
        do = jnp.logical_and(action == A_DO, jnp.logical_not(sleeping))
        # player level from kill XP (craftax's experience ladder): each
        # level past 1 adds +1 melee damage; a ruby-enchanted sword +2
        plevel = 1 + jnp.minimum(
            state.xp // XP_PER_LEVEL, MAX_PLAYER_LEVEL - 1
        )
        sword = (
            1 + inv[INV["wood_sword"]] + inv[INV["stone_sword"]] * 2
            + inv[INV["iron_sword"]] * 3 + inv[INV["diamond_sword"]] * 4
            + (plevel - 1) + 2 * inv[INV["sword_enchant"]]
        )

        # combat (mob on target tile takes priority over the block)
        mob_health = jnp.where(
            here & do, state.mob_health - sword, state.mob_health
        )
        melee_killed = here & do & (mob_health <= 0)
        mob_alive = state.mob_alive & ~melee_killed
        killed_type = (melee_killed[:, None] & _TYPE_ONEHOT).any(0)
        food = jnp.where(
            killed_type[MOB_COW], jnp.minimum(state.food + 6, 9), state.food
        )
        mob_kill_types = killed_type  # first-kill feats commit at step end

        do_block = jnp.logical_and(do, jnp.logical_not(any_mob))

        has_wp = inv[INV["wood_pickaxe"]] > 0
        has_sp = inv[INV["stone_pickaxe"]] > 0
        has_ip = inv[INV["iron_pickaxe"]] > 0
        has_dp = inv[INV["diamond_pickaxe"]] > 0

        got_wood = do_block & (tblock == W.TREE)
        got_drink = do_block & (tblock == W.WATER)
        sap_roll = u_sap < 0.1
        got_sapling = do_block & (tblock == W.GRASS) & sap_roll
        got_stone = do_block & (tblock == W.STONE) & has_wp
        got_coal = do_block & (tblock == W.COAL) & has_wp
        got_iron = do_block & (tblock == W.IRON) & has_sp
        got_diamond = do_block & (tblock == W.DIAMOND) & has_ip
        got_ruby = do_block & (tblock == W.RUBY) & has_ip
        got_sapphire = do_block & (tblock == W.SAPPHIRE) & has_dp
        got_obsidian = do_block & (tblock == W.OBSIDIAN) & has_dp
        got_crystal = do_block & (tblock == W.CRYSTAL) & has_dp
        ate_plant = do_block & (tblock == W.PLANT_RIPE)
        went_down = do_block & (tblock == W.LADDER_DOWN)
        went_up = do_block & (tblock == W.LADDER_UP)
        lvl = jnp.where(went_down, lvl + 1, jnp.where(went_up, lvl - 1, lvl))
        grant("enter_cave", went_down & (state.level == W.SURFACE))
        grant("enter_deep", went_down & (state.level == W.CAVE))
        grant("enter_hell", went_down & (state.level == W.DEEP))
        grant("enter_ice", went_down & (state.level == W.HELL))

        # loot chests: a random potion color, or (rarely) a book — the
        # fireball spellbook on most floors, the FROST TOME (ice spell) in
        # ice-realm chests. One one-hot add, no scatter.
        opened_chest = do_block & (tblock == W.CHEST)
        chest_roll = u_chest
        loot_color = jnp.minimum(
            jnp.floor(chest_roll / 0.28).astype(jnp.int32), NUM_POTIONS
        )  # 0/1/2 potion with p=.28 each, else (p=.16) the book
        on_ice_floor = state.level == W.ICE_REALM
        book_slot = jnp.where(
            on_ice_floor, INV["frost_tome"], INV["spellbook"]
        )
        loot_slot = jnp.where(
            loot_color < NUM_POTIONS,
            INV["potion_red"] + loot_color,
            book_slot,
        )
        got_book = opened_chest & (loot_color == NUM_POTIONS)
        inv = inv + jax.nn.one_hot(
            loot_slot, NUM_INV, dtype=jnp.int32
        ) * opened_chest
        inv = inv.at[INV["spellbook"]].set(
            jnp.minimum(inv[INV["spellbook"]], 1)  # books don't stack
        )
        inv = inv.at[INV["frost_tome"]].set(
            jnp.minimum(inv[INV["frost_tome"]], 1)
        )
        grant("open_chest", opened_chest)
        grant("learn_spell", got_book & ~on_ice_floor)
        grant("learn_ice_spell", got_book & on_ice_floor)

        # all resource pickups land in ONE masked-sum over the constant
        # collect table (order matches _COLLECT_ITEMS)
        collected = jnp.stack(
            [
                got_wood, got_sapling, got_stone, got_coal, got_iron,
                got_diamond, got_ruby, got_sapphire, got_obsidian,
                got_crystal,
            ]
        )
        inv = inv + (_COLLECT_ONEHOT * collected[:, None]).sum(0)
        drink = jnp.where(got_drink, jnp.minimum(state.drink + 3, 9), state.drink)
        food = jnp.where(ate_plant, jnp.minimum(food + 4, 9), food)

        mined = (
            got_stone | got_coal | got_iron | got_diamond | got_ruby
            | got_sapphire | got_obsidian | got_crystal | opened_chest
        )

        for cond, name in [
            (got_wood, "collect_wood"), (got_drink, "collect_drink"),
            (got_sapling, "collect_sapling"), (got_stone, "collect_stone"),
            (got_coal, "collect_coal"), (got_iron, "collect_iron"),
            (got_diamond, "collect_diamond"), (got_ruby, "collect_ruby"),
            (got_sapphire, "collect_sapphire"), (ate_plant, "eat_plant"),
            (got_obsidian, "collect_obsidian"),
            (got_crystal, "collect_crystal"),
        ]:
            grant(name, cond)

        # ---- PLACE actions: one pass over the place table -------------
        placeable = _PLACEABLE[tblock] & jnp.logical_not(any_mob)
        place_ok = (
            (action == _PLACE_ACT)
            & placeable
            & (~_PLACE_GRASS | (tblock == W.GRASS))
            & (inv[None, :] >= _PLACE_COST).all(axis=1)
        )
        inv = inv - (_PLACE_COST * place_ok[:, None]).sum(0)
        for _i, _name in enumerate(_PLACE_NAMES):
            grant(_name, place_ok[_i])
        placed_plant = place_ok[_PLACE_PLANT_ROW]
        # at most one place action fires per step, so the placed block id
        # is a masked sum over the tile column
        place_any = place_ok.any()
        place_tile = (place_ok * _PLACE_TILE).sum()

        # All per-step tile mutations target the SAME facing cell, so they
        # fold into ONE scatter (vmapped single-cell scatters are the
        # expensive op on TPU) plus one growth-timer scatter.
        tile_new = jnp.where(mined, W.PATH, tblock)
        tile_new = jnp.where(ate_plant, W.SAPLING, tile_new)
        tile_new = jnp.where(place_any, place_tile.astype(tblock.dtype), tile_new)
        # tile writes target the level the action happened on (pre-ladder).
        # NOTE: keep these as .at[].set scatters — a batched
        # dynamic_update_slice lowers 3x SLOWER here (measured on v5e).
        alvl = state.level
        blocks = blocks.at[alvl, ty, tx].set(tile_new.astype(blocks.dtype))
        growth = state.growth.at[ty, tx].set(
            jnp.where(
                (ate_plant | placed_plant) & (alvl == W.SURFACE),
                0,
                state.growth[ty, tx],
            ).astype(state.growth.dtype)
        )

        # ---- CRAFT actions ------------------------------------------
        # 3x3 neighborhood from the selector-matmul patch (history: a
        # vmapped dynamic_slice serialized, ~1.7ms/step; its gather
        # replacement was ~40x cheaper; the patch read removes the gather
        # entirely). This runs AFTER the tile write above, so the written
        # cell is overridden with tile_new.
        py, px = pos[0], pos[1]
        d1 = jnp.arange(-1, 2)
        around = jnp.where(
            (py + d1[:, None] == ty) & (px + d1[None, :] == tx),
            tile_new.astype(jnp.int32),
            _patch_read(py + d1[:, None], px + d1[None, :]),
        )
        near_table = (around == W.TABLE).any()
        near_furnace = (around == W.FURNACE).any()

        # one pass over the recipe table (incl. the armor tiers): recipe
        # gates, cost subtraction, and output grant are each a single
        # vectorized op over (N_RECIPES, NUM_INV)
        craft_ok = (
            (action == _CRAFT_ACT)
            & near_table
            & (~_CRAFT_FURNACE | near_furnace)
            & (inv[_CRAFT_OUT] == 0)
            & (inv[None, :] >= _CRAFT_COST).all(axis=1)
        )
        inv = (
            inv
            - (_CRAFT_COST * craft_ok[:, None]).sum(0)
            + (_CRAFT_OUT_ONEHOT & craft_ok[:, None]).sum(0)
        )
        for _i, _name in enumerate(_CRAFT_NAMES):
            grant(_name, craft_ok[_i])

        # arrows stack (unlike tools): wood+stone -> +ARROWS_PER_CRAFT,
        # capped at MAX_ARROWS
        arrow_ok = (
            (action == A_MAKE_ARROW)
            & near_table
            & (inv[INV["wood"]] >= 1)
            & (inv[INV["stone"]] >= 1)
            & (inv[INV["arrow"]] <= MAX_ARROWS - ARROWS_PER_CRAFT)
        )
        inv = jnp.where(
            arrow_ok,
            inv.at[INV["wood"]].add(-1).at[INV["stone"]].add(-1)
            .at[INV["arrow"]].add(ARROWS_PER_CRAFT),
            inv,
        )
        grant("make_arrow", arrow_ok)

        # ---- ENCHANT actions (craftax's gem enchanting) ---------------
        # at a placed enchantment table, a gem + mana permanently upgrades
        # a piece of gear (once per episode per slot): ruby -> sword,
        # sapphire -> bow, ice crystal -> armor
        near_ench = (around == W.ENCHANT_TABLE).any()
        has_any_sword = (
            inv[INV["wood_sword"]] + inv[INV["stone_sword"]]
            + inv[INV["iron_sword"]] + inv[INV["diamond_sword"]]
        ) > 0
        has_any_armor = (
            inv[INV["iron_armor"]] + inv[INV["diamond_armor"]]
        ) > 0

        # one pass over the enchant table: gate vector, then +mark/-gem
        # via the precomputed signed delta matrix
        gear_ok = jnp.stack(
            [has_any_sword, inv[INV["bow"]] > 0, has_any_armor]
        )
        ench_ok = (
            (action == _ENCH_ACT)
            & near_ench
            & gear_ok
            & (inv[_ENCH_MARK] == 0)
            & (inv[_ENCH_GEM] >= 1)
            & (state.mana >= ENCHANT_COST)
        )
        inv = inv + (_ENCH_DELTA * ench_ok[:, None]).sum(0)
        for _i, _name in enumerate(_ENCH_NAMES):
            grant(_name, ench_ok[_i])
        enchanted = ench_ok.any()

        # ---- SHOOT / CAST: projectiles down the facing ray -----------
        # Arrows (bow + arrow in inventory) and fireballs (spellbook +
        # mana) share one ray: it flies up to ARROW_RANGE tiles, stops at
        # the first non-walkable tile, and the nearest mob with
        # line-of-sight takes the projectile's damage. All comparisons
        # are dense (no scatters): ray tiles are a 5-element gather, mob
        # hits one (N_MOBS, R) broadcast compare.
        shoot = (
            (action == A_SHOOT)
            & jnp.logical_not(sleeping)
            & (inv[INV["bow"]] > 0)
            & (inv[INV["arrow"]] > 0)
        )
        cast = (
            (action == A_CAST)
            & jnp.logical_not(sleeping)
            & (inv[INV["spellbook"]] > 0)
            & (state.mana >= SPELL_COST)
        )
        cast_ice = (
            (action == A_CAST_ICE)
            & jnp.logical_not(sleeping)
            & (inv[INV["frost_tome"]] > 0)
            & (state.mana >= ICE_COST)
        )
        proj = shoot | cast | cast_ice
        proj_damage = jnp.where(
            cast,
            SPELL_DAMAGE,
            jnp.where(
                cast_ice,
                ICE_DAMAGE,
                ARROW_DAMAGE + 2 * inv[INV["bow_enchant"]],
            ),
        )
        ray_d = jnp.arange(1, ARROW_RANGE + 1)
        ray = pos[None, :] + ray_d[:, None] * _DIRS[facing][None, :]  # (R, 2)
        # post-write patch read (override the written facing tile)
        ray_vals = jnp.where(
            (ray[:, 0] == ty) & (ray[:, 1] == tx),
            tile_new.astype(jnp.int32),
            _patch_read(ray[:, 0], ray[:, 1]),
        )
        ray_free = _WALKABLE[ray_vals]
        # clear[i]: every tile strictly before ray[i] is walkable
        clear = jnp.concatenate(
            [jnp.array([True]), jnp.cumprod(ray_free[:-1]).astype(bool)]
        )

        # one (N_MOBS, R) compare finds every mob on the ray with LOS
        on_ray = (
            (mob_alive & (state.mob_level == lvl))[:, None]
            & (state.mob_pos[:, 0, None] == ray[None, :, 0])
            & (state.mob_pos[:, 1, None] == ray[None, :, 1])
            & clear[None, :]
        )
        # distance of each mob along the ray (R+1 if not on it)
        rd = jnp.where(on_ray, ray_d[None, :], ARROW_RANGE + 1).min(axis=1)
        nearest = rd.min()
        proj_lands = proj & (nearest <= ARROW_RANGE)
        # arrows and fireballs strike the nearest mob; the ice bolt
        # PIERCES — every mob with line-of-sight along the ray is struck
        struck = jnp.where(
            cast_ice,
            cast_ice & on_ray.any(axis=1),
            proj_lands & (rd == nearest),
        )
        mob_health = jnp.where(struck, mob_health - proj_damage, mob_health)
        inv = jnp.where(shoot, inv.at[INV["arrow"]].add(-1), inv)
        grant("fire_bow", shoot)
        grant("cast_spell", cast)
        grant("cast_ice_spell", cast_ice)

        # projectile kills (cows shot at range still feed you)
        shot = struck & (mob_health <= 0) & mob_alive
        mob_alive = mob_alive & ~shot
        shot_type = (shot[:, None] & _TYPE_ONEHOT).any(0)
        food = jnp.where(shot_type[MOB_COW], jnp.minimum(food + 6, 9), food)
        mob_kill_types = mob_kill_types | shot_type

        # experience: every kill this step banks its type's XP in one
        # masked sum over the mob table
        xp = state.xp + jnp.where(
            melee_killed | shot, _XP_PER_KILL[MOB_TYPE], 0
        ).sum()

        # ---- plant growth (surface only) ----------------------------
        surface = blocks[W.SURFACE]
        is_sapling = surface == W.SAPLING
        growth = jnp.where(is_sapling, growth + 1, 0)
        ripe = is_sapling & (growth >= params.growth_time)
        blocks = blocks.at[W.SURFACE].set(
            jnp.where(ripe, W.PLANT_RIPE, surface)
        )

        # ---- day/night + sleep --------------------------------------
        t = state.time + 1
        is_night = (t % params.day_length) >= (params.day_length // 2)
        wants_sleep = action == A_SLEEP
        sleeping = jnp.where(wants_sleep & is_night, True, sleeping)
        woke = jnp.logical_and(state.sleeping, jnp.logical_not(is_night))
        sleeping = jnp.where(woke, False, sleeping)
        grant("wake_up", woke)

        # ---- needs decay / regen ------------------------------------
        hunger = state.hunger + 1
        thirst = state.thirst + 1
        fatigue = jnp.where(sleeping, 0, state.fatigue + 1)
        food = jnp.where(hunger >= 25, jnp.maximum(food - 1, 0), food)
        hunger = jnp.where(hunger >= 25, 0, hunger)
        drink = jnp.where(thirst >= 20, jnp.maximum(drink - 1, 0), drink)
        thirst = jnp.where(thirst >= 20, 0, thirst)
        energy = jnp.where(
            fatigue >= 30, jnp.maximum(state.energy - 1, 0), state.energy
        )
        fatigue = jnp.where(fatigue >= 30, 0, fatigue)
        energy = jnp.where(
            sleeping & (t % 2 == 0), jnp.minimum(energy + 1, 9), energy
        )

        any_zero = (food == 0) | (drink == 0) | (energy == 0)
        decay_tick = jnp.where(any_zero, state.decay_tick + 1, 0)
        health = jnp.where(
            decay_tick >= 10, jnp.maximum(state.health - 1, 0), state.health
        )
        decay_tick = jnp.where(decay_tick >= 10, 0, decay_tick)
        regen_tick = jnp.where(~any_zero, state.regen_tick + 1, 0)
        health = jnp.where(
            (regen_tick >= 30) & (health < 9), health + 1, health
        )
        regen_tick = jnp.where(regen_tick >= 30, 0, regen_tick)

        # ---- mana + potions -----------------------------------------
        # casting/enchanting spends mana (the three spenders are distinct
        # actions, so at most one fires per step); otherwise it trickles
        # back every 4 steps
        mana_spend = (
            cast * SPELL_COST + cast_ice * ICE_COST
            + enchanted * ENCHANT_COST
        )
        mana = jnp.where(
            mana_spend > 0,
            state.mana - mana_spend,
            jnp.minimum(state.mana + ((t % 4) == 0), MAX_MANA),
        )
        # drinking a potion: the color -> effect mapping was permuted at
        # reset (craftax's potion mechanic), so each life the agent must
        # experiment to learn which color heals, feasts, or poisons
        quaff_color = jnp.clip(action - A_DRINK_RED, 0, NUM_POTIONS - 1)
        quaff = (
            (action >= A_DRINK_RED)
            & (action <= A_DRINK_BLUE)
            & jnp.logical_not(sleeping)
            & (inv[INV["potion_red"] + quaff_color] > 0)
        )
        inv = inv - jax.nn.one_hot(
            INV["potion_red"] + quaff_color, NUM_INV, dtype=jnp.int32
        ) * quaff
        effect = state.potion_map[quaff_color]
        health = jnp.where(
            quaff & (effect == POTION_HEAL), jnp.minimum(health + 4, 9), health
        )
        food = jnp.where(
            quaff & (effect == POTION_FEAST), jnp.minimum(food + 4, 9), food
        )
        drink = jnp.where(
            quaff & (effect == POTION_FEAST), jnp.minimum(drink + 4, 9), drink
        )
        health = jnp.where(
            quaff & (effect == POTION_POISON), jnp.maximum(health - 2, 0),
            health,
        )
        grant("drink_potion", quaff)
        potions_tried = state.potions_tried | (
            quaff & (jnp.arange(NUM_POTIONS) == quaff_color)
        )

        # ---- mob behavior -------------------------------------------
        # zombies: spawn at night near the player (the dungeon is always
        # dangerous), despawn on the surface at dawn. Zombie slots are a
        # STATIC slice of the mob table, so this stays a cheap
        # fixed-index update, not a scatter.
        spawn_offsets = jnp.floor(u_zoff * 17.0).astype(jnp.int32) - 8
        far_enough = jnp.abs(spawn_offsets).sum(axis=1) >= 5
        spawn_pos = jnp.clip(pos + spawn_offsets, W.PAD, W.PAD + W.WORLD_SIZE - 1)
        z_alive = mob_alive[ZOMBIES]
        # patch read post-DO-write; the later surface-ripening write only
        # swaps SAPLING -> PLANT_RIPE, which are both walkable, so the
        # walkability consumed here is exact
        spawn_vals = jnp.where(
            (spawn_pos[:, 0] == ty) & (spawn_pos[:, 1] == tx),
            tile_new.astype(jnp.int32),
            _patch_read(spawn_pos[:, 0], spawn_pos[:, 1]),
        )
        spawn_ok = (
            (is_night | (lvl != W.SURFACE))
            & ~z_alive
            & far_enough
            & (u_zgate < 0.05)
            & _WALKABLE[spawn_vals]
        )
        mob_pos = state.mob_pos.at[ZOMBIES].set(
            jnp.where(spawn_ok[:, None], spawn_pos, state.mob_pos[ZOMBIES])
        )
        mob_level = state.mob_level.at[ZOMBIES].set(
            jnp.where(spawn_ok, lvl, state.mob_level[ZOMBIES])
        )
        mob_health = mob_health.at[ZOMBIES].set(
            jnp.where(spawn_ok, 5, mob_health[ZOMBIES])
        )
        # surface zombies despawn at dawn; dungeon zombies persist
        mob_alive = mob_alive.at[ZOMBIES].set(
            (z_alive | spawn_ok) & (is_night | (mob_level[ZOMBIES] != W.SURFACE))
        )

        # ONE batched movement pass for every species: each mob draws a
        # chase step toward the player (taken with its type's chase prob
        # while on the player's floor) or a random-walk step (its type's
        # wander prob), gated by walkability on its own floor.
        same_lvl = mob_level == lvl
        dirs = jnp.floor(u_dirs * 4.0).astype(jnp.int32)
        delta = pos[None, :] - mob_pos
        go_y = jnp.abs(delta[:, 0]) >= jnp.abs(delta[:, 1])
        chase = jnp.stack(
            [
                jnp.where(go_y, jnp.sign(delta[:, 0]), 0),
                jnp.where(go_y, 0, jnp.sign(delta[:, 1])),
            ],
            axis=1,
        ).astype(jnp.int32)
        wants_chase = same_lvl & (
            u_chase < _CHASE_P[MOB_TYPE]
        )
        walk_p = jnp.where(
            same_lvl, _WALK_P_SAME[MOB_TYPE], _WALK_P_AWAY[MOB_TYPE]
        )
        wants_walk = u_walk < walk_p
        cand = jnp.clip(
            mob_pos
            + jnp.where(
                wants_chase[:, None],
                chase,
                jnp.where(wants_walk[:, None], _DIRS[dirs], 0),
            ),
            W.PAD,
            W.PAD + W.WORLD_SIZE - 1,
        )
        # per-mob walkability without the (N_MOBS,) multi-level gather:
        # contract one-hot row selectors against the full block stack on
        # the MXU, then pick level/column with exact one-hot dots. Reads
        # the pre-ripening map like the gather it replaces did until this
        # round — SAPLING/PLANT_RIPE are both walkable, so the consumed
        # bool is identical; the DO-write tile is overridden exactly.
        m_oy = jax.nn.one_hot(cand[:, 0], blocks.shape[1])
        m_ox = jax.nn.one_hot(cand[:, 1], blocks.shape[2])
        m_ol = jax.nn.one_hot(mob_level, blocks.shape[0])
        t1 = jnp.einsum(
            "ny,lyx->nlx", m_oy, state.blocks.astype(jnp.float32)
        )
        cand_vals = jnp.einsum("nlx,nl,nx->n", t1, m_ol, m_ox).astype(
            jnp.int32
        )
        cand_vals = jnp.where(
            (mob_level == lvl) & (cand[:, 0] == ty) & (cand[:, 1] == tx),
            tile_new.astype(jnp.int32),
            cand_vals,
        )
        move_ok = (
            _WALKABLE[cand_vals]
            & mob_alive
            & (wants_chase | wants_walk)
        )
        mob_pos = jnp.where(move_ok[:, None], cand, mob_pos)

        # mob melee damage (adjacent, every other step; worse when
        # asleep; deep-floor mobs hit harder: orc 2, warden 3; cows 0)
        adj = (
            mob_alive
            & (mob_level == lvl)
            & (jnp.abs(mob_pos - pos[None, :]).sum(axis=1) <= 1)
        )
        base_dmg = jnp.where(adj, _MELEE_DMG[MOB_TYPE], 0).max()
        # armor shaves a point per tier off melee hits (never below 1:
        # even the ICE QUEEN's claws chip a fully-armored player); a
        # crystal enchantment adds one more tier
        armor = (
            inv[INV["iron_armor"]] + 2 * inv[INV["diamond_armor"]]
            + inv[INV["armor_enchant"]]
        )
        base_dmg = jnp.where(
            base_dmg > 0, jnp.maximum(base_dmg - armor, 1), 0
        )
        dmg = jnp.where(
            (base_dmg > 0) & (t % 2 == 0),
            base_dmg + sleeping.astype(jnp.int32),
            0,
        )
        health = jnp.maximum(health - dmg, 0)

        # ---- commit the deferred achievement grants ------------------
        # one (n_grants, NUM_ACH) constant mask & one (n_mob_types,
        # NUM_ACH) mask replace ~30 per-id scatter kernels
        g_ids = jnp.asarray([i for i, _ in grants])
        g_conds = jnp.stack([c for _, c in grants])
        g_mask = g_ids[:, None] == jnp.arange(NUM_ACHIEVEMENTS)[None, :]
        ach = ach | (g_conds[:, None] & g_mask).any(0)
        ach = ach | (mob_kill_types[:, None] & _MOB_ACH_ONEHOT).any(0)

        # ---- derived achievements -----------------------------------
        # latched conditions over current state, OR'd in via ONE vector
        # op (per-id .at[].set scatters would each be their own kernel)
        derived = jnp.stack(
            [
                cast & struck.any(),                       # fireball_kill
                shoot & struck.any() & (nearest >= 4),     # marksman
                (inv[INV["diamond"]] > 0) & (inv[INV["ruby"]] > 0)
                & (inv[INV["sapphire"]] > 0),              # collect_all_gems
                # health (not alive): a boss whose spawn placement failed
                # was never alive but must not count as slain
                (mob_health[WARDEN] <= 0) & (mob_health[NECRO] <= 0)
                & (mob_health[QUEEN] <= 0),
                # full_belly: must be a REFILL (you spawn full)
                (food >= 9) & (drink >= 9)
                & ~((state.food >= 9) & (state.drink >= 9)),
                cast_ice & shot.any(),                     # ice_kill
                potions_tried.all(),                       # drink_all_potions
                xp >= XP_PER_LEVEL,                        # level_up
                xp >= (MAX_PLAYER_LEVEL - 1) * XP_PER_LEVEL,  # veteran
                (inv[INV["wood_pickaxe"]] > 0)             # craft_all_tools
                & (inv[INV["stone_pickaxe"]] > 0)
                & (inv[INV["iron_pickaxe"]] > 0)
                & (inv[INV["diamond_pickaxe"]] > 0)
                & (inv[INV["wood_sword"]] > 0)
                & (inv[INV["stone_sword"]] > 0)
                & (inv[INV["iron_sword"]] > 0)
                & (inv[INV["diamond_sword"]] > 0),
            ]
        )
        ach = ach | (derived[:, None] & _DERIVED_ONEHOT).any(0)

        # ---- reward / termination -----------------------------------
        new_ach = jnp.logical_and(ach, jnp.logical_not(state.achievements))
        reward = (
            new_ach.sum().astype(jnp.float32)
            + 0.1 * (health - old_health).astype(jnp.float32)
        )
        terminal = health <= 0

        new_state = ForagerState(
            blocks=blocks, growth=growth, pos=pos, level=lvl, facing=facing,
            health=health, food=food, drink=drink, energy=energy,
            hunger=hunger, thirst=thirst, fatigue=fatigue,
            decay_tick=decay_tick, regen_tick=regen_tick,
            sleeping=sleeping, mana=mana, xp=xp,
            potion_map=state.potion_map, potions_tried=potions_tried,
            inventory=inv, achievements=ach,
            mob_pos=mob_pos, mob_level=mob_level,
            mob_alive=mob_alive, mob_health=mob_health,
            time=t, terminal=terminal,
        )
        done = self.is_terminal(new_state, params)
        info = {"achievement_count": ach.sum().astype(jnp.float32)}
        if self.log_achievements:
            info.update(
                {
                    f"achievements/{name}": ach[i].astype(jnp.float32)
                    for i, name in enumerate(ACHIEVEMENTS)
                }
            )
        return (
            jax.lax.stop_gradient(self.get_obs(new_state, params)),
            jax.lax.stop_gradient(new_state),
            reward,
            done,
            info,
        )

    # ------------------------------------------------------------------
    def get_obs(self, state: ForagerState, params) -> jax.Array:
        half = VIEW // 2
        # the stored map is pre-padded with an INVALID border (W.PAD >= half).
        # The local window is extracted with one-hot SELECTOR MATMULS on the
        # MXU — not a vmapped dynamic_slice (serializes on TPU) and not a
        # batched gather (TPU gathers run near-scalar: the gather form cost
        # ~1.15 ms/update at the 1024-env bench config, ~28% of wall clock;
        # this form is bitwise-identical — 0/1 selectors pick exactly one
        # int value per cell, exact in f32 — and took the bench row from
        # 249k to 335k env-steps/s. Round-4 ablation notes in ROADMAP.md.
        dv = jnp.arange(VIEW) - half
        lv = jax.nn.one_hot(state.level, state.blocks.shape[0])
        level_map = jnp.einsum(
            "l,lyx->yx", lv, state.blocks.astype(jnp.float32)
        )
        ry = jax.nn.one_hot(state.pos[0] + dv, state.blocks.shape[1])
        rx = jax.nn.one_hot(state.pos[1] + dv, state.blocks.shape[2])
        window = (ry @ level_map @ rx.T).astype(jnp.int32)
        block_onehot = jax.nn.one_hot(window, W.NUM_BLOCK_TYPES)

        # Dense compare instead of a scatter-max: (N_MOBS, V, V)
        # broadcasting compares reduce over the mob axis — scatters are
        # the one op class the TPU serializes, and this runs entirely on
        # the VPU. One pass covers all five species; the per-type
        # channels fall out of a static type-onehot mask.
        rel = state.mob_pos - state.pos[None, :] + half
        vis = state.mob_alive & (state.mob_level == state.level)
        ys = jnp.arange(VIEW)
        hit = (
            vis[:, None, None]
            & (rel[:, 0, None, None] == ys[None, :, None])
            & (rel[:, 1, None, None] == ys[None, None, :])
        )  # (N_MOBS, V, V)
        mobs = (
            (hit[:, :, :, None] & _TYPE_ONEHOT[:, None, None, :])
            .any(axis=0)
            .astype(jnp.float32)
        )  # (V, V, NUM_MOB_TYPES)
        grid = jnp.concatenate([block_onehot, mobs], axis=-1).reshape(-1)

        day_frac = (state.time % params.day_length) / params.day_length
        extras = jnp.concatenate(
            [
                state.inventory.astype(jnp.float32) / 9.0,
                jnp.array(
                    [
                        state.health / 9.0,
                        state.food / 9.0,
                        state.drink / 9.0,
                        state.energy / 9.0,
                        state.mana / MAX_MANA,
                    ]
                ),
                jax.nn.one_hot(state.facing, 4),
                jnp.array(
                    [
                        jnp.sin(2 * jnp.pi * day_frac),
                        jnp.cos(2 * jnp.pi * day_frac),
                    ]
                ),
                state.sleeping.astype(jnp.float32)[None],
                state.level.astype(jnp.float32)[None] / (W.NUM_LEVELS - 1),
                # XP ladder: current level (normalized) + progress to next
                jnp.array(
                    [
                        jnp.minimum(
                            state.xp // XP_PER_LEVEL, MAX_PLAYER_LEVEL - 1
                        )
                        / (MAX_PLAYER_LEVEL - 1),
                        (state.xp % XP_PER_LEVEL) / XP_PER_LEVEL,
                    ],
                    jnp.float32,
                ),
                state.potions_tried.astype(jnp.float32),
            ]
        )
        return jnp.concatenate([grid, extras]).astype(jnp.float32)

    def is_terminal(self, state, params):
        return jnp.logical_or(
            state.terminal, state.time >= params.max_steps_in_episode
        )

    def observation_space(self, params):
        return spaces.Box(-1.0, 1.0, (OBS_DIM,), jnp.float32)

    def action_space(self, params=None):
        return spaces.Discrete(NUM_ACTIONS)
