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
NUM_BLOCK_TYPES = 19

# map levels (craftax-style vertical depth)
SURFACE = 0
CAVE = 1
DEEP = 2
NUM_LEVELS = 3

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
    lava hazards, and a DEEP level of tight corridors, heavy lava, and the
    richest diamond/ruby veins (ruby spawns nowhere else). Aligned ladder
    pairs connect surface<->cave and cave<->deep (craftax's multi-floor
    dungeon descent). int8 storage quarters HBM traffic for the
    scatter-heavy step function."""
    key, k_cave, k_deep, k_ladder, k_ladder2 = jax.random.split(key, 5)
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
    cave = jnp.where(open_cell & (cnoise > 0.8), LAVA, cave)
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
    deep = jnp.where(open_deep & (dnoise > 0.55), LAVA, deep)
    dfeat = jax.random.uniform(k_dfeat, (WORLD_SIZE, WORLD_SIZE))
    dwall = deep == STONE
    deep = jnp.where(dwall & (dfeat < 0.18), IRON, deep)
    deep = jnp.where(dwall & (dfeat >= 0.18) & (dfeat < 0.30), DIAMOND, deep)
    deep = jnp.where(dwall & (dfeat >= 0.30) & (dfeat < 0.38), RUBY, deep)
    deep = jnp.where(dwall & (dfeat >= 0.38) & (dfeat < 0.43), SAPPHIRE, deep)

    # ---- aligned ladder pairs ------------------------------------------
    # two ladders per floor seam at random interior cells; the upper floor
    # gets LADDER_DOWN on a carved tile, the lower floor LADDER_UP with a
    # 3x3 cleared pocket (both sides carved so the seam is traversable)
    # row bands keep the two seams' ladder cells disjoint (a shared cell
    # would overwrite a cave LADDER_UP with a LADDER_DOWN)
    lpos = jax.random.randint(
        k_ladder, (2, 2), 6, WORLD_SIZE - 6
    ).at[:, 0].set(jax.random.randint(k_ladder, (2,), 6, WORLD_SIZE // 2))
    lpos2 = jax.random.randint(
        k_ladder2, (2, 2), 6, WORLD_SIZE - 6
    ).at[:, 0].set(
        jax.random.randint(k_ladder2, (2,), WORLD_SIZE // 2, WORLD_SIZE - 6)
    )
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

    world = jnp.stack([blocks, cave, deep]).astype(jnp.int8)
    return jnp.pad(
        world, ((0, 0), (PAD, PAD), (PAD, PAD)), constant_values=INVALID
    )
