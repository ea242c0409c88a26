"""Procedural world generation for Forager (the craftax-class env).

Terrain comes from bilinear-upsampled value noise — one coarse gaussian
grid per octave, fully vectorized, so a whole batch of worlds generates as
a few (B, H, W) tensor ops under vmap. Worldgen is deliberately the
expensive part of reset (hundreds of times the cost of a step), which is
exactly the regime the OptimisticResetVecEnv wrapper exists for
(reference: utils/craftax_wrappers.py:83-148).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# block ids
INVALID = 0
WATER = 1
SAND = 2
GRASS = 3
PATH = 4
TREE = 5
STONE = 6
COAL = 7
IRON = 8
DIAMOND = 9
TABLE = 10
FURNACE = 11
SAPLING = 12
PLANT_RIPE = 13
LADDER_DOWN = 14
LADDER_UP = 15
LAVA = 16
RUBY = 17
SAPPHIRE = 18
OBSIDIAN = 19
CHEST = 20
TORCH = 21
ENCHANT_TABLE = 22
ICE = 23
CRYSTAL = 24
NUM_BLOCK_TYPES = 25

# map levels (craftax-style vertical depth)
SURFACE = 0
CAVE = 1
DEEP = 2
HELL = 3
ICE_REALM = 4
NUM_LEVELS = 5

WORLD_SIZE = 48
# The env stores the map PRE-PADDED with an INVALID border of PAD cells:
# the local-view window then slices without re-padding every step, and the
# border doubles as the world boundary (INVALID is unwalkable). Positions
# live in padded coordinates [PAD, PAD + WORLD_SIZE).
PAD = 4
PADDED_SIZE = WORLD_SIZE + 2 * PAD



def _kth_largest(x: jax.Array, k: int) -> jax.Array:
    """Threshold selecting a fixed COUNT of top cells: the kth-largest
    value. lax.top_k with small static k lowers far cheaper than the full
    bitonic sort a jnp.quantile/jnp.sort implies — and the optimistic
    reset pool runs worldgen num_envs/reset_ratio times per STEP, so this
    is hot-path code, not init code."""
    return jax.lax.top_k(x.ravel(), k)[0][-1]

def _value_noise(key: jax.Array, size: int, res: int, n: int = 0) -> jax.Array:
    """Bilinearly upsampled gaussian grid noise in roughly [-1, 1].

    With n > 0, generates a BATCH of n independent fields from one key in
    one pass — the four dungeon floors share a single PRNG kernel and one
    interpolation chain instead of four of each (worldgen is hot-path
    code: the optimistic reset pool runs it num_envs/reset_ratio times
    per step)."""
    batched = n > 0
    shape = (max(n, 1), res + 1, res + 1)
    coarse = jax.random.normal(key, shape)
    xs = jnp.linspace(0.0, res, size)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, res - 1)
    frac = xs - x0
    # interpolate rows then columns (leading batch axis broadcasts)
    top = coarse[:, x0][:, :, x0]
    bottom = coarse[:, x0 + 1][:, :, x0]
    right_top = coarse[:, x0][:, :, x0 + 1]
    right_bottom = coarse[:, x0 + 1][:, :, x0 + 1]
    fy = frac[None, :, None]
    fx = frac[None, None, :]
    v = (
        top * (1 - fy) * (1 - fx)
        + bottom * fy * (1 - fx)
        + right_top * (1 - fy) * fx
        + right_bottom * fy * fx
    )
    v = v * 0.8
    return v if batched else v[0]


def generate_world(key: jax.Array) -> jax.Array:
    """Generate a (NUM_LEVELS, PADDED_SIZE, PADDED_SIZE) int8 block map
    (INVALID border of PAD): a surface level — water/sand/grass plains
    with forests and a stony highland seamed with ores — a CAVE level
    (craftax-style depth) of stone passages with much richer ore veins and
    lava hazards, a DEEP level of tight corridors, heavy lava, and the
    richest diamond/ruby veins (ruby spawns nowhere else), a HELL
    level of obsidian walls (diamond pickaxe to mine), lava
    seas, and the densest loot chests, and an ICE REALM at the very
    bottom (craftax's elemental end-floors): frozen ground, drinkable
    melt pools, crystal ore in the walls (the enchanting reagent), and
    guaranteed chest loot. Chests holding potions and
    spellbooks are scattered over every dungeon floor. Aligned ladder
    pairs connect each floor seam (craftax's multi-floor dungeon
    descent). int8 storage quarters HBM traffic for the scatter-heavy
    step function."""
    (
        key, k_cave, k_ladder, k_ladder2, k_ladder3, k_ladder4
    ) = jax.random.split(key, 6)
    k_elev, k_detail, k_feat = jax.random.split(key, 3)

    elev = _value_noise(k_elev, WORLD_SIZE, 6) + 0.5 * _value_noise(
        k_detail, WORLD_SIZE, 12
    )

    blocks = jnp.full((WORLD_SIZE, WORLD_SIZE), GRASS, jnp.int8)
    blocks = jnp.where(elev < -0.55, WATER, blocks)
    blocks = jnp.where((elev >= -0.55) & (elev < -0.4), SAND, blocks)
    highland = elev > 0.55

    # One uniform field drives all per-cell features: trees live only on
    # lowland grass and ores only on highland, so disjoint thresholds of a
    # single draw give the same marginal densities as independent draws
    # (ore types were already mutually exclusive by overwrite priority) at
    # 1/4 the PRNG cost — this runs num_envs/reset_ratio times per step
    # under optimistic resets.
    feat = jax.random.uniform(k_feat, (WORLD_SIZE, WORLD_SIZE))
    blocks = jnp.where((blocks == GRASS) & (feat < 0.12) & ~highland, TREE, blocks)

    blocks = jnp.where(highland, STONE, blocks)
    blocks = jnp.where(highland & (feat < 0.10), COAL, blocks)
    blocks = jnp.where(highland & (feat >= 0.10) & (feat < 0.15), IRON, blocks)
    blocks = jnp.where(
        highland & (feat >= 0.15) & (feat < 0.17) & (elev > 0.85),
        DIAMOND,
        blocks,
    )

    # clear a spawn point at the center
    c = WORLD_SIZE // 2
    blocks = jax.lax.dynamic_update_slice(
        blocks, jnp.full((3, 3), GRASS, jnp.int8), (c - 1, c - 1)
    )

    # ---- dungeon floors: shared batched noise/feature fields -------------
    # one (4, H, W) noise pass + one (4, H, W) uniform pass feed all four
    # floors; per-floor thresholds batch into a single top_k
    k_dnoise4, k_dfeat4 = jax.random.split(k_cave)
    noise4 = _value_noise(k_dnoise4, WORLD_SIZE, 8, n=4)
    feat4 = jax.random.uniform(k_dfeat4, (4, WORLD_SIZE, WORLD_SIZE))
    cnoise, dnoise, hnoise, inoise = noise4
    cfeat, dfeat, hfeat, ifeat = feat4
    # lava/melt coverage per floor: cave 5%, deep 8%, hell 20%, ice 6%
    # (separate top_k per floor: top_k cost scales with k, so batching all
    # rows to hell's k=461 costs more than four small selections)
    cthresh = _kth_largest(cnoise, 115)
    dthresh = _kth_largest(dnoise, 184)
    hthresh_lava = _kth_largest(hnoise, 461)
    ithresh_melt = _kth_largest(inoise, 138)

    # ---- cave level -----------------------------------------------------
    cave = jnp.full((WORLD_SIZE, WORLD_SIZE), STONE, jnp.int8)
    open_cell = cnoise > -0.15  # ~60% passages
    cave = jnp.where(open_cell, PATH, cave)
    # ~5% lava hazards (fixed top-k count: keeps the cave<deep<hell lava
    # ordering deterministic across seeds — see the DEEP comment)
    cave = jnp.where(cnoise > cthresh, LAVA, cave)
    wall = cave == STONE
    cave = jnp.where(wall & (cfeat < 0.15), COAL, cave)
    cave = jnp.where(wall & (cfeat >= 0.15) & (cfeat < 0.27), IRON, cave)
    cave = jnp.where(wall & (cfeat >= 0.27) & (cfeat < 0.33), DIAMOND, cave)

    # ---- deep level -----------------------------------------------------
    # tighter corridors, more lava, no coal — but the richest diamond
    # veins and the only ruby deposits
    deep = jnp.full((WORLD_SIZE, WORLD_SIZE), STONE, jnp.int8)
    open_deep = dnoise > 0.05  # ~45% passages
    deep = jnp.where(open_deep, PATH, deep)
    # lava covers a fixed ~8% of the floor (fixed count, not an absolute
    # threshold: noise amplitude varies enough seed-to-seed that absolute
    # cuts swing the lava count 3x, breaking the cave<deep<hell ordering)
    deep = jnp.where(dnoise > dthresh, LAVA, deep)
    dwall = deep == STONE
    deep = jnp.where(dwall & (dfeat < 0.18), IRON, deep)
    deep = jnp.where(dwall & (dfeat >= 0.18) & (dfeat < 0.30), DIAMOND, deep)
    deep = jnp.where(dwall & (dfeat >= 0.30) & (dfeat < 0.38), RUBY, deep)
    deep = jnp.where(dwall & (dfeat >= 0.38) & (dfeat < 0.43), SAPPHIRE, deep)

    # ---- hell level -----------------------------------------------------
    # the bottom of the dungeon: obsidian walls (diamond-pickaxe-tier),
    # lava seas across the open ground, and the densest chest loot
    hell = jnp.full((WORLD_SIZE, WORLD_SIZE), OBSIDIAN, jnp.int8)
    open_hell = hnoise > 0.1  # ~40% passages
    hell = jnp.where(open_hell, PATH, hell)
    # lava seas: a fixed ~20% of the floor (always denser than DEEP's 8%)
    hell = jnp.where(hnoise > hthresh_lava, LAVA, hell)

    # ---- ice realm ------------------------------------------------------
    # the frozen bottom floor: walkable ICE ground, drinkable melt pools,
    # CRYSTAL ore seamed through the stone walls (the enchanting reagent
    # spawns nowhere else), no lava
    ice = jnp.full((WORLD_SIZE, WORLD_SIZE), STONE, jnp.int8)
    open_ice = inoise > -0.05  # ~50% frozen ground
    ice = jnp.where(open_ice, ICE, ice)
    # melt pools: a fixed ~6% of the floor is drinkable water
    ice = jnp.where(inoise > ithresh_melt, WATER, ice)
    iwall = ice == STONE
    ice = jnp.where(iwall & (ifeat < 0.20), CRYSTAL, ice)

    # ---- loot chests ----------------------------------------------------
    # every dungeon floor hides chests on open ground, denser with depth
    cave = jnp.where((cave == PATH) & (cfeat > 0.995), CHEST, cave)
    deep = jnp.where((deep == PATH) & (dfeat > 0.99), CHEST, deep)
    # hell: exactly the top-12 path cells by score become chests (seeds
    # where lava+obsidian squeeze the walkable area would otherwise drop
    # below the guaranteed loot floor)
    hscore = jnp.where(hell == PATH, hfeat, -1.0)
    hthresh = _kth_largest(hscore, 12)
    hell = jnp.where((hscore >= hthresh) & (hscore > 0), CHEST, hell)
    # ice realm: top-10 frozen cells hold the frost-tome loot pool
    iscore = jnp.where(ice == ICE, ifeat, -1.0)
    ithresh = _kth_largest(iscore, 10)
    ice = jnp.where((iscore >= ithresh) & (iscore > 0), CHEST, ice)

    # ---- aligned ladder pairs ------------------------------------------
    # two ladders per floor seam at random interior cells; the upper floor
    # gets LADDER_DOWN on a carved tile, the lower floor LADDER_UP with a
    # 3x3 cleared pocket (both sides carved so the seam is traversable)
    # row bands keep the two seams' ladder cells disjoint (a shared cell
    # would overwrite a cave LADDER_UP with a LADDER_DOWN)
    band = (WORLD_SIZE - 14) // 4  # four disjoint row bands, one per seam
    half = WORLD_SIZE // 2

    def _seam_pair(k, row_lo, row_hi):
        # the pair's columns come from disjoint left/right halves (>=4
        # apart) so neither the cells nor their 3x3 pockets can collide —
        # a collision would overwrite one ladder and break the seam
        rows = jax.random.randint(k, (2,), row_lo, row_hi)
        cols = jax.random.randint(
            jax.random.fold_in(k, 1), (2,), 0, half - 8
        ) + jnp.array([6, half + 2])
        return jnp.stack([rows, cols], axis=1)

    # bands end 2 rows short of the next band: a pocket carve (radius 1)
    # from one seam must never reach another seam's ladder cell
    lpos = _seam_pair(k_ladder, 6, 6 + band - 2)
    lpos2 = _seam_pair(k_ladder2, 6 + band, 6 + 2 * band - 2)
    lpos3 = _seam_pair(k_ladder3, 6 + 2 * band, 6 + 3 * band - 2)
    lpos4 = _seam_pair(k_ladder4, 6 + 3 * band, WORLD_SIZE - 8)
    yy = jnp.arange(WORLD_SIZE)

    def _carve(floor, pos, fill, ladder):
        # masked 3x3 pocket carve for BOTH of a seam's ladder cells in one
        # where + one two-cell scatter (a traced-index dynamic_update_slice
        # serializes under vmap on TPU, and per-cell loops doubled the op
        # count — the reset pool runs this num_envs/reset_ratio times per
        # step)
        mask = (
            (jnp.abs(yy[:, None, None] - pos[None, None, :, 0]) <= 1)
            & (jnp.abs(yy[None, :, None] - pos[None, None, :, 1]) <= 1)
        ).any(-1)
        floor = jnp.where(mask, jnp.int8(fill), floor)
        return floor.at[pos[:, 0], pos[:, 1]].set(ladder)

    blocks = blocks.at[lpos[:, 0], lpos[:, 1]].set(LADDER_DOWN)
    cave = _carve(cave, lpos, PATH, LADDER_UP)
    cave = _carve(cave, lpos2, PATH, LADDER_DOWN)
    deep = _carve(deep, lpos2, PATH, LADDER_UP)
    deep = _carve(deep, lpos3, PATH, LADDER_DOWN)
    hell = _carve(hell, lpos3, PATH, LADDER_UP)
    hell = _carve(hell, lpos4, PATH, LADDER_DOWN)
    ice = _carve(ice, lpos4, ICE, LADDER_UP)

    world = jnp.stack([blocks, cave, deep, hell, ice]).astype(jnp.int8)
    return jnp.pad(
        world, ((0, 0), (PAD, PAD), (PAD, PAD)), constant_values=INVALID
    )
