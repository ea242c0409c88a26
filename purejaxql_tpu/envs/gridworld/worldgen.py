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


def _value_noise(key: jax.Array, size: int, res: int) -> jax.Array:
    """Bilinearly upsampled gaussian grid noise in roughly [-1, 1]."""
    coarse = jax.random.normal(key, (res + 1, res + 1))
    xs = jnp.linspace(0.0, res, size)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, res - 1)
    frac = xs - x0
    # interpolate rows then columns
    top = coarse[x0][:, x0]
    bottom = coarse[x0 + 1][:, x0]
    right_top = coarse[x0][:, x0 + 1]
    right_bottom = coarse[x0 + 1][:, x0 + 1]
    fy = frac[:, None]
    fx = frac[None, :]
    v = (
        top * (1 - fy) * (1 - fx)
        + bottom * fy * (1 - fx)
        + right_top * (1 - fy) * fx
        + right_bottom * fy * fx
    )
    return v * 0.8


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
        key, k_cave, k_deep, k_hell, k_ice,
        k_ladder, k_ladder2, k_ladder3, k_ladder4,
    ) = jax.random.split(key, 9)
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

    # ---- cave level -----------------------------------------------------
    k_cnoise, k_cfeat = jax.random.split(k_cave)
    cnoise = _value_noise(k_cnoise, WORLD_SIZE, 8)
    cave = jnp.full((WORLD_SIZE, WORLD_SIZE), STONE, jnp.int8)
    open_cell = cnoise > -0.15  # ~60% passages
    cave = jnp.where(open_cell, PATH, cave)
    # ~5% lava hazards (quantile: keeps the cave<deep<hell lava ordering
    # deterministic across seeds — see the DEEP comment)
    cave = jnp.where(cnoise > jnp.quantile(cnoise, 0.95), LAVA, cave)
    cfeat = jax.random.uniform(k_cfeat, (WORLD_SIZE, WORLD_SIZE))
    wall = cave == STONE
    cave = jnp.where(wall & (cfeat < 0.15), COAL, cave)
    cave = jnp.where(wall & (cfeat >= 0.15) & (cfeat < 0.27), IRON, cave)
    cave = jnp.where(wall & (cfeat >= 0.27) & (cfeat < 0.33), DIAMOND, cave)

    # ---- deep level -----------------------------------------------------
    # tighter corridors, more lava, no coal — but the richest diamond
    # veins and the only ruby deposits
    k_dnoise, k_dfeat = jax.random.split(k_deep)
    dnoise = _value_noise(k_dnoise, WORLD_SIZE, 8)
    deep = jnp.full((WORLD_SIZE, WORLD_SIZE), STONE, jnp.int8)
    open_deep = dnoise > 0.05  # ~45% passages
    deep = jnp.where(open_deep, PATH, deep)
    # lava covers a fixed ~8% of the floor (quantile, not an absolute
    # threshold: noise amplitude varies enough seed-to-seed that absolute
    # cuts swing the lava count 3x, breaking the cave<deep<hell ordering)
    deep = jnp.where(dnoise > jnp.quantile(dnoise, 0.92), LAVA, deep)
    dfeat = jax.random.uniform(k_dfeat, (WORLD_SIZE, WORLD_SIZE))
    dwall = deep == STONE
    deep = jnp.where(dwall & (dfeat < 0.18), IRON, deep)
    deep = jnp.where(dwall & (dfeat >= 0.18) & (dfeat < 0.30), DIAMOND, deep)
    deep = jnp.where(dwall & (dfeat >= 0.30) & (dfeat < 0.38), RUBY, deep)
    deep = jnp.where(dwall & (dfeat >= 0.38) & (dfeat < 0.43), SAPPHIRE, deep)

    # ---- hell level -----------------------------------------------------
    # the bottom of the dungeon: obsidian walls (diamond-pickaxe-tier),
    # lava seas across the open ground, and the densest chest loot
    k_hnoise, k_hfeat = jax.random.split(k_hell)
    hnoise = _value_noise(k_hnoise, WORLD_SIZE, 8)
    hell = jnp.full((WORLD_SIZE, WORLD_SIZE), OBSIDIAN, jnp.int8)
    open_hell = hnoise > 0.1  # ~40% passages
    hell = jnp.where(open_hell, PATH, hell)
    # lava seas: a fixed ~20% of the floor (always denser than DEEP's 8%)
    hell = jnp.where(hnoise > jnp.quantile(hnoise, 0.80), LAVA, hell)

    # ---- ice realm ------------------------------------------------------
    # the frozen bottom floor: walkable ICE ground, drinkable melt pools,
    # CRYSTAL ore seamed through the stone walls (the enchanting reagent
    # spawns nowhere else), no lava
    k_inoise, k_ifeat = jax.random.split(k_ice)
    inoise = _value_noise(k_inoise, WORLD_SIZE, 8)
    ice = jnp.full((WORLD_SIZE, WORLD_SIZE), STONE, jnp.int8)
    open_ice = inoise > -0.05  # ~50% frozen ground
    ice = jnp.where(open_ice, ICE, ice)
    # melt pools: a fixed ~6% of the floor is drinkable water
    ice = jnp.where(inoise > jnp.quantile(inoise, 0.94), WATER, ice)
    ifeat = jax.random.uniform(k_ifeat, (WORLD_SIZE, WORLD_SIZE))
    iwall = ice == STONE
    ice = jnp.where(iwall & (ifeat < 0.20), CRYSTAL, ice)

    # ---- loot chests ----------------------------------------------------
    # every dungeon floor hides chests on open ground, denser with depth
    cave = jnp.where((cave == PATH) & (cfeat > 0.995), CHEST, cave)
    deep = jnp.where((deep == PATH) & (dfeat > 0.99), CHEST, deep)
    # hell: exactly the top-12 path cells by score become chests (seeds
    # where lava+obsidian squeeze the walkable area would otherwise drop
    # below the guaranteed loot floor)
    hfeat = jax.random.uniform(k_hfeat, (WORLD_SIZE, WORLD_SIZE))
    hscore = jnp.where(hell == PATH, hfeat, -1.0)
    hthresh = jnp.sort(hscore.ravel())[-12]
    hell = jnp.where((hscore >= hthresh) & (hscore > 0), CHEST, hell)
    # ice realm: top-10 frozen cells hold the frost-tome loot pool
    iscore = jnp.where(ice == ICE, ifeat, -1.0)
    ithresh = jnp.sort(iscore.ravel())[-10]
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

    def _pocket(ly, lx):
        # masked 3x3 pocket carve: a traced-index dynamic_update_slice
        # serializes under vmap on TPU (the reset pool runs this
        # num_envs/reset_ratio times per step)
        return (jnp.abs(yy[:, None] - ly) <= 1) & (
            jnp.abs(yy[None, :] - lx) <= 1
        )

    for i in range(2):
        ly, lx = lpos[i, 0], lpos[i, 1]
        blocks = blocks.at[ly, lx].set(LADDER_DOWN)
        cave = jnp.where(_pocket(ly, lx), jnp.int8(PATH), cave)
        cave = cave.at[ly, lx].set(LADDER_UP)

    for i in range(2):
        ly, lx = lpos2[i, 0], lpos2[i, 1]
        cave = jnp.where(_pocket(ly, lx), jnp.int8(PATH), cave)
        cave = cave.at[ly, lx].set(LADDER_DOWN)
        deep = jnp.where(_pocket(ly, lx), jnp.int8(PATH), deep)
        deep = deep.at[ly, lx].set(LADDER_UP)

    for i in range(2):
        ly, lx = lpos3[i, 0], lpos3[i, 1]
        deep = jnp.where(_pocket(ly, lx), jnp.int8(PATH), deep)
        deep = deep.at[ly, lx].set(LADDER_DOWN)
        hell = jnp.where(_pocket(ly, lx), jnp.int8(PATH), hell)
        hell = hell.at[ly, lx].set(LADDER_UP)

    for i in range(2):
        ly, lx = lpos4[i, 0], lpos4[i, 1]
        hell = jnp.where(_pocket(ly, lx), jnp.int8(PATH), hell)
        hell = hell.at[ly, lx].set(LADDER_DOWN)
        ice = jnp.where(_pocket(ly, lx), jnp.int8(ICE), ice)
        ice = ice.at[ly, lx].set(LADDER_UP)

    world = jnp.stack([blocks, cave, deep, hell, ice]).astype(jnp.int8)
    return jnp.pad(
        world, ((0, 0), (PAD, PAD), (PAD, PAD)), constant_values=INVALID
    )
