"""Forager (craftax-class) env tests: world structure, survival dynamics,
achievements, crafting chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from purejaxql_tpu.envs import make
from purejaxql_tpu.envs.gridworld import forager as F
from purejaxql_tpu.envs.gridworld import worldgen as W


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    """This module's ~30 tests each eagerly compile several full env-step
    programs on the 8-device mesh; letting the executables accumulate
    aborts the process in native code around test ~23 (the same
    thread/mapping exhaustion the conftest's module-scoped clear guards
    against, hit within one module). Per-test clearing keeps the live
    executable count flat."""
    yield
    jax.clear_caches()


def test_world_composition():
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    blocks = np.asarray(state.blocks)
    assert blocks.shape == (W.NUM_LEVELS, W.PADDED_SIZE, W.PADDED_SIZE)
    counts = np.bincount(
        blocks[W.SURFACE].ravel(), minlength=W.NUM_BLOCK_TYPES
    )
    cave_counts = np.bincount(
        blocks[W.CAVE].ravel(), minlength=W.NUM_BLOCK_TYPES
    )
    assert cave_counts[W.PATH] > 300, "cave should have passages"
    assert cave_counts[W.DIAMOND] > 5, "cave should have diamond veins"
    assert counts[W.LADDER_DOWN] == 2 and cave_counts[W.LADDER_UP] == 2
    assert counts[W.GRASS] > 400, "world should be mostly traversable"
    assert counts[W.TREE] > 20
    assert counts[W.STONE] > 50
    assert counts[W.WATER] > 20
    assert counts[W.COAL] + counts[W.IRON] > 5


def test_worlds_differ_by_seed():
    env, params = make("Forager-v0")
    _, s1 = env.reset(jax.random.PRNGKey(0), params)
    _, s2 = env.reset(jax.random.PRNGKey(1), params)
    assert (np.asarray(s1.blocks) != np.asarray(s2.blocks)).mean() > 0.05


def test_obs_shape_and_range():
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    assert obs.shape == (F.OBS_DIM,)
    assert np.isfinite(np.asarray(obs)).all()
    assert env.action_space(params).n == F.NUM_ACTIONS


def test_random_play_achieves_and_dies():
    env, params = make("Forager-v0")
    n = 32

    def step(carry, _):
        obs, state, rng = carry
        rng, ra, rs = jax.random.split(rng, 3)
        actions = jax.random.randint(ra, (n,), 0, F.NUM_ACTIONS)
        keys = jax.random.split(rs, n)
        obs, state, r, d, info = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
            keys, state, actions, params
        )
        return (obs, state, rng), (r, d, info["achievement_count"])

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    obs, state = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    f = jax.jit(lambda c: jax.lax.scan(step, c, None, 400))
    (_, _, _), (rs, ds, achc) = f((obs, state, jax.random.PRNGKey(1)))
    assert np.asarray(achc).max() >= 2, "random play should hit easy achievements"
    assert np.asarray(ds).sum() > 0, "nobody ever died"
    assert np.isfinite(np.asarray(rs)).all()


def test_scripted_wood_collection():
    """Walk to a tree and 'do' on it: wood + achievement + reward."""
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(2), params)
    # teleport the player next to a tree facing it (test backdoor via state)
    blocks = np.asarray(state.blocks[W.SURFACE])
    ty, tx = np.argwhere(blocks == W.TREE)[0]
    # stand below the tree, facing up
    state = state.replace(
        pos=jnp.asarray([ty + 1, tx], jnp.int32), facing=jnp.asarray(0)
    )
    obs, state, r, d, info = env.step(
        jax.random.PRNGKey(3), state, jnp.asarray(F.A_DO), params
    )
    assert int(state.inventory[F.INV["wood"]]) == 1
    assert bool(state.achievements[F._ACH["collect_wood"]])
    assert float(r) >= 1.0


def test_crafting_chain():
    """With resources granted, table placement + pickaxe crafting works."""
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(4), params)
    inv = state.inventory.at[F.INV["wood"]].set(5)
    state = state.replace(inventory=inv)
    # face a grass tile
    blocks = np.asarray(state.blocks[W.SURFACE])
    gy, gx = np.argwhere(blocks == W.GRASS)[100]
    state = state.replace(
        pos=jnp.asarray([gy + 1, gx], jnp.int32), facing=jnp.asarray(0)
    )
    obs, state, r, d, _ = env.step(
        jax.random.PRNGKey(5), state, jnp.asarray(F.A_PLACE_TABLE), params
    )
    assert bool(state.achievements[F._ACH["place_table"]]), "table not placed"
    obs, state, r, d, _ = env.step(
        jax.random.PRNGKey(6), state, jnp.asarray(F.A_MAKE_WP), params
    )
    assert int(state.inventory[F.INV["wood_pickaxe"]]) == 1
    assert bool(state.achievements[F._ACH["make_wood_pickaxe"]])


def test_death_by_starvation():
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(7), params)
    state = state.replace(
        food=jnp.asarray(0), drink=jnp.asarray(0), energy=jnp.asarray(0)
    )

    def step(carry, _):
        state, rng = carry
        rng, k = jax.random.split(rng)
        _, state, r, d, _ = env.step_env(k, state, jnp.asarray(F.A_NOOP), params)
        return (state, rng), d

    (_, _), dones = jax.lax.scan(
        step, (state, jax.random.PRNGKey(8)), None, 120
    )
    assert bool(np.asarray(dones).any()), "starvation never killed the player"


def test_cave_descent_and_rich_ores():
    """DO on a ladder descends to the cave (achievement), the cave holds
    richer diamond veins, and DO on a ladder-up returns to the surface."""
    import jax.numpy as jnp

    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(11), params)
    surface = np.asarray(state.blocks[W.SURFACE])
    ly, lx = np.argwhere(surface == W.LADDER_DOWN)[0]
    # stand below the ladder facing up
    state = state.replace(
        pos=jnp.asarray([ly + 1, lx], jnp.int32), facing=jnp.asarray(0)
    )
    obs, state, r, d, _ = env.step(
        jax.random.PRNGKey(12), state, jnp.asarray(F.A_DO), params
    )
    assert int(state.level) == W.CAVE
    assert bool(state.achievements[F._ACH["enter_cave"]])
    assert float(r) >= 1.0  # first-time achievement

    cave = np.asarray(state.blocks[W.CAVE])
    assert (cave == W.DIAMOND).sum() > (surface == W.DIAMOND).sum()

    # the ladder-up is at the same coords; face it and ascend
    state = state.replace(
        pos=jnp.asarray([ly + 1, lx], jnp.int32), facing=jnp.asarray(0)
    )
    obs, state, r, d, _ = env.step(
        jax.random.PRNGKey(13), state, jnp.asarray(F.A_DO), params
    )
    assert int(state.level) == W.SURFACE


def test_deep_floor_descent_ruby_and_skeletons():
    """The dungeon has a third floor: cave ladders descend to DEEP
    (achievement), ruby spawns only there (iron pickaxe to mine), and
    skeletons haunt both dungeon floors."""
    import jax.numpy as jnp

    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(11), params)
    blocks = np.asarray(state.blocks)

    # ruby exists on the deep floor and nowhere else
    assert (blocks[W.DEEP] == W.RUBY).sum() > 5
    assert (blocks[W.SURFACE] == W.RUBY).sum() == 0
    assert (blocks[W.CAVE] == W.RUBY).sum() == 0
    # seams: cave has both ladder directions, deep has the ups
    assert (blocks[W.CAVE] == W.LADDER_DOWN).sum() == 2
    assert (blocks[W.DEEP] == W.LADDER_UP).sum() == 2
    # deep is harsher: more lava than the cave
    assert (blocks[W.DEEP] == W.LAVA).sum() > (blocks[W.CAVE] == W.LAVA).sum()

    # descend cave -> deep via a scripted ladder DO
    ly, lx = np.argwhere(blocks[W.CAVE] == W.LADDER_DOWN)[0]
    state = state.replace(
        level=jnp.asarray(W.CAVE, jnp.int32),
        pos=jnp.asarray([ly + 1, lx], jnp.int32),
        facing=jnp.asarray(0),
    )
    obs, state, r, d, _ = env.step(
        jax.random.PRNGKey(12), state, jnp.asarray(F.A_DO), params
    )
    assert int(state.level) == W.DEEP
    assert bool(state.achievements[F._ACH["enter_deep"]])
    assert float(r) >= 1.0

    # climb back up to the cave
    state = state.replace(
        pos=jnp.asarray([ly + 1, lx], jnp.int32), facing=jnp.asarray(0)
    )
    obs, state, r, d, _ = env.step(
        jax.random.PRNGKey(13), state, jnp.asarray(F.A_DO), params
    )
    assert int(state.level) == W.CAVE

    # skeletons are assigned to both dungeon floors
    lvls = np.asarray(state.mob_level)[F.SKELS]
    assert (lvls == W.CAVE).any() and (lvls == W.DEEP).any()


def test_ruby_requires_iron_pickaxe():
    import jax.numpy as jnp

    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(5), params)
    blocks = np.asarray(state.blocks)
    ry, rx = np.argwhere(blocks[W.DEEP] == W.RUBY)[0]
    state = state.replace(
        level=jnp.asarray(W.DEEP, jnp.int32),
        pos=jnp.asarray([ry + 1, rx], jnp.int32),
        facing=jnp.asarray(0),
    )
    # without an iron pickaxe: nothing happens
    _, s2, r, _, _ = env.step(
        jax.random.PRNGKey(6), state, jnp.asarray(F.A_DO), params
    )
    assert int(s2.inventory[F.INV["ruby"]]) == 0
    assert int(np.asarray(s2.blocks)[W.DEEP, ry, rx]) == W.RUBY
    # with one: ruby mined, achievement, tile becomes path
    state = state.replace(
        inventory=state.inventory.at[F.INV["iron_pickaxe"]].set(1)
    )
    _, s3, r, _, _ = env.step(
        jax.random.PRNGKey(6), state, jnp.asarray(F.A_DO), params
    )
    assert int(s3.inventory[F.INV["ruby"]]) == 1
    assert bool(s3.achievements[F._ACH["collect_ruby"]])
    assert float(r) >= 1.0
    assert int(np.asarray(s3.blocks)[W.DEEP, ry, rx]) == W.PATH


def test_tier2_diamond_tools_and_sapphire():
    """Diamond pickaxe/sword craft at a furnace+table; sapphire needs the
    diamond pickaxe; diamond sword raises melee damage."""
    import jax.numpy as jnp

    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(3), params)
    blocks = np.asarray(state.blocks)

    # sapphire only on deep
    assert (blocks[W.DEEP] == W.SAPPHIRE).sum() > 5
    assert (blocks[:2] == W.SAPPHIRE).sum() == 0

    # teleport next to a table+furnace we place by fiat on the surface
    py, px = int(state.pos[0]), int(state.pos[1])
    new_blocks = state.blocks.at[W.SURFACE, py, px + 1].set(W.TABLE)
    new_blocks = new_blocks.at[W.SURFACE, py, px - 1].set(W.FURNACE)
    state = state.replace(
        blocks=new_blocks,
        inventory=state.inventory.at[F.INV["wood"]].set(5)
        .at[F.INV["diamond"]].set(3),
    )
    _, state, r, _, _ = env.step(
        jax.random.PRNGKey(4), state, jnp.asarray(F.A_MAKE_DP), params
    )
    assert int(state.inventory[F.INV["diamond_pickaxe"]]) == 1
    assert bool(state.achievements[F._ACH["make_diamond_pickaxe"]])
    assert float(r) >= 1.0
    _, state, r, _, _ = env.step(
        jax.random.PRNGKey(5), state, jnp.asarray(F.A_MAKE_DS), params
    )
    assert int(state.inventory[F.INV["diamond_sword"]]) == 1
    assert bool(state.achievements[F._ACH["make_diamond_sword"]])

    # mine a sapphire on the deep floor with the diamond pickaxe
    sy, sx = np.argwhere(blocks[W.DEEP] == W.SAPPHIRE)[0]
    state = state.replace(
        level=jnp.asarray(W.DEEP, jnp.int32),
        pos=jnp.asarray([sy + 1, sx], jnp.int32),
        facing=jnp.asarray(0),
    )
    _, state, r, _, _ = env.step(
        jax.random.PRNGKey(6), state, jnp.asarray(F.A_DO), params
    )
    assert int(state.inventory[F.INV["sapphire"]]) == 1
    assert bool(state.achievements[F._ACH["collect_sapphire"]])


def test_tier2_bow_and_arrow():
    """Bow + arrows craft at a table; shooting hits the first mob along
    the facing ray with line-of-sight."""
    import jax.numpy as jnp

    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(7), params)
    py, px = int(state.pos[0]), int(state.pos[1])
    state = state.replace(
        blocks=state.blocks.at[W.SURFACE, py, px + 1].set(W.TABLE),
        inventory=state.inventory.at[F.INV["wood"]].set(5)
        .at[F.INV["stone"]].set(3),
    )
    _, state, _, _, _ = env.step(
        jax.random.PRNGKey(8), state, jnp.asarray(F.A_MAKE_BOW), params
    )
    assert int(state.inventory[F.INV["bow"]]) == 1
    assert bool(state.achievements[F._ACH["make_bow"]])
    _, state, _, _, _ = env.step(
        jax.random.PRNGKey(9), state, jnp.asarray(F.A_MAKE_ARROW), params
    )
    assert int(state.inventory[F.INV["arrow"]]) == F.ARROWS_PER_CRAFT
    assert bool(state.achievements[F._ACH["make_arrow"]])

    # park a zombie 3 tiles down the facing ray on clear ground (at night,
    # so the surface-zombie dawn-despawn rule doesn't cull it mid-test)
    state = state.replace(
        facing=jnp.asarray(2),  # facing down (+y)
        time=jnp.asarray(159, jnp.int32),
    )
    ray = [(py + d, px) for d in range(1, 4)]
    b = state.blocks
    for (yy, xx) in ray:
        b = b.at[W.SURFACE, yy, xx].set(W.GRASS)
    z0 = F.ZOMBIES.start  # first zombie slot in the mob table
    state = state.replace(
        blocks=b,
        mob_pos=state.mob_pos.at[z0].set(jnp.asarray([py + 3, px])),
        mob_alive=state.mob_alive.at[z0].set(True),
        mob_level=state.mob_level.at[z0].set(W.SURFACE),
        mob_health=state.mob_health.at[z0].set(F.ARROW_DAMAGE),
    )
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(10), state, jnp.asarray(F.A_SHOOT), params
    )
    assert int(s2.inventory[F.INV["arrow"]]) == F.ARROWS_PER_CRAFT - 1
    assert bool(s2.achievements[F._ACH["fire_bow"]])
    assert not bool(s2.mob_alive[z0]), "arrow should kill the zombie"
    assert bool(s2.achievements[F._ACH["defeat_zombie"]])

    # a wall blocks line-of-sight
    state = state.replace(
        blocks=state.blocks.at[W.SURFACE, py + 1, px].set(W.STONE),
        mob_health=state.mob_health.at[z0].set(F.ARROW_DAMAGE),
    )
    _, s3, _, _, _ = env.step(
        jax.random.PRNGKey(11), state, jnp.asarray(F.A_SHOOT), params
    )
    assert bool(s3.mob_alive[z0]), "wall should block the arrow"


def test_tier2_orcs_and_warden():
    """Orcs and the warden live on the deep floor, hit harder than
    zombies, and grant achievements when slain."""
    import jax.numpy as jnp

    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(12), params)
    assert bool(state.mob_alive[F.WARDEN])
    assert (
        int(np.asarray(state.mob_alive)[F.ORCS].sum()) >= 3
    ), "orc spawns should be robust"

    # put the player on deep next to a nearly-dead warden (bare-fist
    # damage is 1)
    wy, wx = int(state.mob_pos[F.WARDEN, 0]), int(state.mob_pos[F.WARDEN, 1])
    state = state.replace(
        level=jnp.asarray(W.DEEP, jnp.int32),
        pos=jnp.asarray([wy + 1, wx], jnp.int32),
        facing=jnp.asarray(0),
        mob_health=state.mob_health.at[F.WARDEN].set(1),
    )
    _, s2, r, _, _ = env.step(
        jax.random.PRNGKey(13), state, jnp.asarray(F.A_DO), params
    )
    assert not bool(s2.mob_alive[F.WARDEN])
    assert bool(s2.achievements[F._ACH["defeat_warden"]])
    assert float(r) >= 1.0

    # adjacent live warden deals 3 damage on even ticks
    state = state.replace(
        mob_health=state.mob_health.at[F.WARDEN].set(20),
        time=jnp.asarray(1, jnp.int32),  # next step has t % 2 == 0
    )
    _, s3, _, _, _ = env.step(
        jax.random.PRNGKey(14), state, jnp.asarray(F.A_NOOP), params
    )
    # warden may have moved adjacent->adjacent; player took warden-tier damage
    assert int(s3.health) <= int(state.health) - 3


def test_hell_floor_structure_and_descent():
    """HELL: obsidian walls (diamond pickaxe to mine), lava seas, the
    densest chests, and a ladder seam from DEEP."""
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(21), params)
    blocks = np.asarray(state.blocks)
    assert blocks.shape[0] == W.NUM_LEVELS

    assert (blocks[W.HELL] == W.OBSIDIAN).sum() > 100
    assert (blocks[W.HELL] == W.LAVA).sum() > (blocks[W.DEEP] == W.LAVA).sum()
    assert (blocks[W.HELL] == W.CHEST).sum() >= 5
    assert (blocks[W.DEEP] == W.LADDER_DOWN).sum() == 2
    assert (blocks[W.HELL] == W.LADDER_UP).sum() == 2
    # obsidian exists nowhere above hell
    assert (blocks[: W.HELL] == W.OBSIDIAN).sum() == 0

    # scripted descent deep -> hell
    ly, lx = np.argwhere(blocks[W.DEEP] == W.LADDER_DOWN)[0]
    state = state.replace(
        level=jnp.asarray(W.DEEP, jnp.int32),
        pos=jnp.asarray([ly + 1, lx], jnp.int32),
        facing=jnp.asarray(0),
    )
    obs, state, r, d, _ = env.step(
        jax.random.PRNGKey(22), state, jnp.asarray(F.A_DO), params
    )
    assert int(state.level) == W.HELL
    assert bool(state.achievements[F._ACH["enter_hell"]])
    assert float(r) >= 1.0

    # obsidian needs the diamond pickaxe
    oy, ox = np.argwhere(blocks[W.HELL] == W.OBSIDIAN)[0]
    state = state.replace(
        pos=jnp.asarray([oy + 1, ox], jnp.int32), facing=jnp.asarray(0)
    )
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(23), state, jnp.asarray(F.A_DO), params
    )
    assert int(s2.inventory[F.INV["obsidian"]]) == 0
    state = state.replace(
        inventory=state.inventory.at[F.INV["diamond_pickaxe"]].set(1)
    )
    _, s3, r, _, _ = env.step(
        jax.random.PRNGKey(23), state, jnp.asarray(F.A_DO), params
    )
    assert int(s3.inventory[F.INV["obsidian"]]) == 1
    assert bool(s3.achievements[F._ACH["collect_obsidian"]])


def test_chest_loot():
    """DO on a chest consumes it and yields a potion or the spellbook."""
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(31), params)
    blocks = np.asarray(state.blocks)
    cy, cx = np.argwhere(blocks[W.HELL] == W.CHEST)[0]
    state = state.replace(
        level=jnp.asarray(W.HELL, jnp.int32),
        pos=jnp.asarray([cy + 1, cx], jnp.int32),
        facing=jnp.asarray(0),
    )
    _, s2, r, _, _ = env.step(
        jax.random.PRNGKey(32), state, jnp.asarray(F.A_DO), params
    )
    assert bool(s2.achievements[F._ACH["open_chest"]])
    assert float(r) >= 1.0
    assert int(np.asarray(s2.blocks)[W.HELL, cy, cx]) == W.PATH
    p0 = F.INV["potion_red"]
    loot = int(np.asarray(s2.inventory)[p0 : p0 + 3].sum()) + int(
        s2.inventory[F.INV["spellbook"]]
    )
    assert loot == 1, "chest should yield exactly one item"


def test_potions_follow_episode_permutation():
    """Drinking a potion applies the effect its color maps to THIS
    episode; the mapping is hidden state permuted at reset."""
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(41), params)
    pmap = np.asarray(state.potion_map)
    assert sorted(pmap.tolist()) == [0, 1, 2]

    p0 = F.INV["potion_red"]
    inv = state.inventory.at[p0].set(3).at[p0 + 1].set(3).at[p0 + 2].set(3)
    base = state.replace(
        inventory=inv,
        health=jnp.asarray(5, jnp.int32),
        food=jnp.asarray(3, jnp.int32),
        drink=jnp.asarray(3, jnp.int32),
    )
    for color in range(3):
        _, s2, _, _, _ = env.step(
            jax.random.PRNGKey(42), base,
            jnp.asarray(F.A_DRINK_RED + color), params
        )
        assert int(s2.inventory[p0 + color]) == 2, "potion not consumed"
        assert bool(s2.achievements[F._ACH["drink_potion"]])
        effect = int(pmap[color])
        if effect == F.POTION_HEAL:
            assert int(s2.health) == 9
        elif effect == F.POTION_FEAST:
            assert int(s2.food) == 7 and int(s2.drink) == 7
        else:  # poison
            assert int(s2.health) == 3

    # no potion in inventory -> nothing happens
    _, s3, _, _, _ = env.step(
        jax.random.PRNGKey(43), state, jnp.asarray(F.A_DRINK_RED), params
    )
    assert not bool(s3.achievements[F._ACH["drink_potion"]])


def test_spellbook_fireball_and_mana():
    """A spellbook + mana lets CAST fire a heavy ray projectile; mana is
    spent on cast and trickles back over time."""
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(51), params)
    py, px = int(state.pos[0]), int(state.pos[1])

    # park a zombie 3 tiles down the facing ray on clear ground, at night
    b = state.blocks
    for d in range(1, 4):
        b = b.at[W.SURFACE, py + d, px].set(W.GRASS)
    z0 = F.ZOMBIES.start
    armed = state.replace(
        blocks=b,
        facing=jnp.asarray(2),
        time=jnp.asarray(159, jnp.int32),
        inventory=state.inventory.at[F.INV["spellbook"]].set(1),
        mana=jnp.asarray(9, jnp.int32),
        mob_pos=state.mob_pos.at[z0].set(jnp.asarray([py + 3, px])),
        mob_alive=state.mob_alive.at[z0].set(True),
        mob_level=state.mob_level.at[z0].set(W.SURFACE),
        mob_health=state.mob_health.at[z0].set(F.SPELL_DAMAGE),
    )
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(52), armed, jnp.asarray(F.A_CAST), params
    )
    assert bool(s2.achievements[F._ACH["cast_spell"]])
    assert not bool(s2.mob_alive[z0]), "fireball should kill the zombie"
    assert int(s2.mana) == 9 - F.SPELL_COST

    # no book -> no cast; no mana -> no cast
    nobook = armed.replace(
        inventory=armed.inventory.at[F.INV["spellbook"]].set(0)
    )
    _, s3, _, _, _ = env.step(
        jax.random.PRNGKey(52), nobook, jnp.asarray(F.A_CAST), params
    )
    assert not bool(s3.achievements[F._ACH["cast_spell"]])
    nomana = armed.replace(mana=jnp.asarray(F.SPELL_COST - 1, jnp.int32))
    _, s4, _, _, _ = env.step(
        jax.random.PRNGKey(52), nomana, jnp.asarray(F.A_CAST), params
    )
    assert not bool(s4.achievements[F._ACH["cast_spell"]])

    # mana trickles back: 4 noop steps from 0 gain at least 1
    drained = state.replace(mana=jnp.asarray(0, jnp.int32))
    st = drained
    for i in range(4):
        _, st, _, _, _ = env.step(
            jax.random.PRNGKey(53 + i), st, jnp.asarray(F.A_NOOP), params
        )
    assert int(st.mana) >= 1


def test_demons_and_necromancer():
    """Demons and the necromancer haunt the hell floor; the necromancer
    is the toughest boss and grants the final combat achievement."""
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(61), params)
    assert bool(state.mob_alive[F.NECRO])
    assert int(np.asarray(state.mob_alive)[F.DEMONS].sum()) >= 3
    assert int(state.mob_health[F.NECRO]) == 30

    ny, nx = int(state.mob_pos[F.NECRO, 0]), int(state.mob_pos[F.NECRO, 1])
    state = state.replace(
        level=jnp.asarray(W.HELL, jnp.int32),
        pos=jnp.asarray([ny + 1, nx], jnp.int32),
        facing=jnp.asarray(0),
        mob_health=state.mob_health.at[F.NECRO].set(1),
    )
    _, s2, r, _, _ = env.step(
        jax.random.PRNGKey(62), state, jnp.asarray(F.A_DO), params
    )
    assert not bool(s2.mob_alive[F.NECRO])
    assert bool(s2.achievements[F._ACH["defeat_necromancer"]])
    assert float(r) >= 1.0

    # an adjacent live necromancer hits for 4 on even ticks
    state = state.replace(
        mob_health=state.mob_health.at[F.NECRO].set(30),
        time=jnp.asarray(1, jnp.int32),
    )
    _, s3, _, _, _ = env.step(
        jax.random.PRNGKey(63), state, jnp.asarray(F.A_NOOP), params
    )
    assert int(s3.health) <= int(state.health) - 4


def test_armor_crafts_and_blunts_melee():
    """Iron/diamond armor craft at a table+furnace and shave their tier
    off melee damage (never below 1 chip damage)."""
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(70), params)
    py, px = int(state.pos[0]), int(state.pos[1])
    blocks = state.blocks.at[state.level, py, px + 1].set(W.TABLE)
    blocks = blocks.at[state.level, py, px - 1].set(W.FURNACE)
    inv = (
        state.inventory.at[F.INV["iron"]].set(4)
        .at[F.INV["coal"]].set(1)
        .at[F.INV["diamond"]].set(2)
    )
    state = state.replace(blocks=blocks, inventory=inv)
    _, s1, r1, _, _ = env.step(
        jax.random.PRNGKey(71), state, jnp.asarray(F.A_MAKE_IA), params
    )
    assert int(s1.inventory[F.INV["iron_armor"]]) == 1
    assert bool(s1.achievements[F._ACH["make_iron_armor"]])
    assert int(s1.inventory[F.INV["iron"]]) == 1  # 3 iron + 1 coal spent
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(72), s1, jnp.asarray(F.A_MAKE_DA), params
    )
    assert int(s2.inventory[F.INV["diamond_armor"]]) == 1
    assert bool(s2.achievements[F._ACH["make_diamond_armor"]])

    # necromancer melee (4 dmg) against tier-3 armor -> 1 chip damage
    ny, nx = int(s2.mob_pos[F.NECRO, 0]), int(s2.mob_pos[F.NECRO, 1])
    armored = s2.replace(
        level=jnp.asarray(W.HELL, jnp.int32),
        pos=jnp.asarray([ny + 1, nx], jnp.int32),
        time=jnp.asarray(1, jnp.int32),
        mob_alive=s2.mob_alive.at[F.NECRO].set(True),
        mob_health=s2.mob_health.at[F.NECRO].set(30),
    )
    _, s3, _, _, _ = env.step(
        jax.random.PRNGKey(73), armored, jnp.asarray(F.A_NOOP), params
    )
    assert int(s3.health) == int(armored.health) - 1
    naked = armored.replace(inventory=jnp.zeros_like(armored.inventory))
    _, s4, _, _, _ = env.step(
        jax.random.PRNGKey(73), naked, jnp.asarray(F.A_NOOP), params
    )
    assert int(s4.health) <= int(naked.health) - 4


def test_derived_achievements_latch():
    """collect_all_gems, slay_all_bosses and full_belly are derived from
    state each step; full_belly requires a refill (you spawn full)."""
    env, params = make("Forager-v0")
    obs, state = env.reset(jax.random.PRNGKey(74), params)
    # spawning full must NOT grant full_belly
    _, s0, _, _, _ = env.step(
        jax.random.PRNGKey(75), state, jnp.asarray(F.A_NOOP), params
    )
    assert not bool(s0.achievements[F._ACH["full_belly"]])
    # refill transition does: drop below, then drink back to full
    low = state.replace(drink=jnp.asarray(6, jnp.int32))
    ty, tx = int(low.pos[0]) - 1, int(low.pos[1])
    blocks = low.blocks.at[low.level, ty, tx].set(W.WATER)
    low = low.replace(blocks=blocks, facing=jnp.asarray(0))
    _, s1, _, _, _ = env.step(
        jax.random.PRNGKey(76), low, jnp.asarray(F.A_DO), params
    )
    assert bool(s1.achievements[F._ACH["full_belly"]])

    gems = state.replace(
        inventory=state.inventory.at[F.INV["diamond"]].set(1)
        .at[F.INV["ruby"]].set(1).at[F.INV["sapphire"]].set(1)
    )
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(77), gems, jnp.asarray(F.A_NOOP), params
    )
    assert bool(s2.achievements[F._ACH["collect_all_gems"]])
    assert not bool(s2.achievements[F._ACH["slay_all_bosses"]])

    slain = state.replace(
        mob_health=state.mob_health.at[F.WARDEN].set(0).at[F.NECRO].set(0),
        mob_alive=state.mob_alive.at[F.WARDEN].set(False)
        .at[F.NECRO].set(False),
    )
    _, s3, _, _, _ = env.step(
        jax.random.PRNGKey(78), slain, jnp.asarray(F.A_NOOP), params
    )
    # two of three bosses down is not enough — the ICE QUEEN remains
    assert not bool(s3.achievements[F._ACH["slay_all_bosses"]])
    all_slain = slain.replace(
        mob_health=slain.mob_health.at[F.QUEEN].set(0),
        mob_alive=slain.mob_alive.at[F.QUEEN].set(False),
    )
    _, s4, _, _, _ = env.step(
        jax.random.PRNGKey(78), all_slain, jnp.asarray(F.A_NOOP), params
    )
    assert bool(s4.achievements[F._ACH["slay_all_bosses"]])


# ---- tier-4 content: ice realm, enchanting, torches, XP, second spell ---


def test_ice_realm_structure():
    """The fifth floor is frozen ground with crystal ore, melt pools,
    guaranteed chests, and an aligned ladder seam up to hell."""
    env, params = make("Forager-v0")
    _, state = env.reset(jax.random.PRNGKey(80), params)
    blocks = np.asarray(state.blocks)
    assert blocks.shape[0] == W.NUM_LEVELS == 5
    ice = np.bincount(blocks[W.ICE_REALM].ravel(), minlength=W.NUM_BLOCK_TYPES)
    hell = np.bincount(blocks[W.HELL].ravel(), minlength=W.NUM_BLOCK_TYPES)
    assert ice[W.ICE] > 300, "ice realm should be mostly frozen ground"
    assert ice[W.CRYSTAL] > 10, "crystal ore seams the walls"
    assert ice[W.WATER] > 20, "melt pools are drinkable"
    assert ice[W.CHEST] == 10, "guaranteed frost-tome loot pool"
    assert ice[W.LAVA] == 0, "no lava in the ice realm"
    assert hell[W.LADDER_DOWN] == 2 and ice[W.LADDER_UP] == 2
    # seams align: every hell LADDER_DOWN sits on an ice LADDER_UP cell
    down = np.argwhere(blocks[W.HELL] == W.LADDER_DOWN)
    for y, x in down:
        assert blocks[W.ICE_REALM, y, x] == W.LADDER_UP
    # wraiths + queen spawn on the ice floor
    assert int(state.mob_alive[F.WRAITHS].sum()) >= 2
    assert bool(state.mob_alive[F.QUEEN])
    assert int(state.mob_level[F.QUEEN]) == W.ICE_REALM


def test_place_torch_and_enchant_table():
    env, params = make("Forager-v0")
    _, state = env.reset(jax.random.PRNGKey(81), params)
    blocks = np.asarray(state.blocks[W.SURFACE])
    gy, gx = np.argwhere(blocks == W.GRASS)[200]
    state = state.replace(
        pos=jnp.asarray([gy + 1, gx], jnp.int32), facing=jnp.asarray(0),
        inventory=state.inventory.at[F.INV["wood"]].set(1)
        .at[F.INV["coal"]].set(1),
    )
    _, s1, r1, _, _ = env.step(
        jax.random.PRNGKey(82), state, jnp.asarray(F.A_PLACE_TORCH), params
    )
    assert int(s1.blocks[W.SURFACE, gy, gx]) == W.TORCH
    assert bool(s1.achievements[F._ACH["place_torch"]])
    assert int(s1.inventory[F.INV["wood"]]) == 0
    assert int(s1.inventory[F.INV["coal"]]) == 0
    # enchant table: stone + diamond on a fresh tile
    gy2, gx2 = np.argwhere(blocks == W.GRASS)[300]
    s2 = s1.replace(
        pos=jnp.asarray([gy2 + 1, gx2], jnp.int32), facing=jnp.asarray(0),
        inventory=s1.inventory.at[F.INV["stone"]].set(1)
        .at[F.INV["diamond"]].set(1),
    )
    _, s3, _, _, _ = env.step(
        jax.random.PRNGKey(83), s2, jnp.asarray(F.A_PLACE_ENCHANT), params
    )
    assert int(s3.blocks[W.SURFACE, gy2, gx2]) == W.ENCHANT_TABLE
    assert bool(s3.achievements[F._ACH["place_enchant_table"]])
    # without resources nothing places
    bare = state.replace(inventory=jnp.zeros_like(state.inventory))
    _, s4, _, _, _ = env.step(
        jax.random.PRNGKey(84), bare, jnp.asarray(F.A_PLACE_TORCH), params
    )
    assert int(s4.blocks[W.SURFACE, gy, gx]) != W.TORCH


def test_enchanting_gates_and_effects():
    """Enchants need the table adjacent, the gear, the gem, and mana;
    they consume the gem + mana and set the 0/1 enchant mark."""
    env, params = make("Forager-v0")
    _, state = env.reset(jax.random.PRNGKey(85), params)
    blocks = np.asarray(state.blocks[W.SURFACE])
    gy, gx = np.argwhere(blocks == W.GRASS)[250]
    inv = (
        state.inventory.at[F.INV["ruby"]].set(1)
        .at[F.INV["sapphire"]].set(1)
        .at[F.INV["crystal"]].set(1)
        .at[F.INV["iron_sword"]].set(1)
        .at[F.INV["bow"]].set(1)
        .at[F.INV["iron_armor"]].set(1)
    )
    near = state.replace(
        pos=jnp.asarray([gy + 1, gx], jnp.int32),
        blocks=state.blocks.at[W.SURFACE, gy, gx].set(W.ENCHANT_TABLE),
        inventory=inv,
        mana=jnp.asarray(9, jnp.int32),
    )
    _, s1, _, _, _ = env.step(
        jax.random.PRNGKey(86), near, jnp.asarray(F.A_ENCH_SWORD), params
    )
    assert int(s1.inventory[F.INV["sword_enchant"]]) == 1
    assert int(s1.inventory[F.INV["ruby"]]) == 0
    assert int(s1.mana) == 9 - F.ENCHANT_COST
    assert bool(s1.achievements[F._ACH["enchant_sword"]])
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(87), s1, jnp.asarray(F.A_ENCH_BOW), params
    )
    assert int(s2.inventory[F.INV["bow_enchant"]]) == 1
    assert bool(s2.achievements[F._ACH["enchant_bow"]])
    _, s3, _, _, _ = env.step(
        jax.random.PRNGKey(88), s2, jnp.asarray(F.A_ENCH_ARMOR), params
    )
    assert int(s3.inventory[F.INV["armor_enchant"]]) == 1
    assert bool(s3.achievements[F._ACH["enchant_armor"]])
    # away from the table nothing enchants
    far = near.replace(
        blocks=state.blocks, mana=jnp.asarray(9, jnp.int32)
    )
    _, s4, _, _, _ = env.step(
        jax.random.PRNGKey(89), far, jnp.asarray(F.A_ENCH_SWORD), params
    )
    assert int(s4.inventory[F.INV["sword_enchant"]]) == 0
    # no mana -> no enchant
    dry = near.replace(mana=jnp.asarray(0, jnp.int32))
    _, s5, _, _, _ = env.step(
        jax.random.PRNGKey(90), dry, jnp.asarray(F.A_ENCH_SWORD), params
    )
    assert int(s5.inventory[F.INV["sword_enchant"]]) == 0


def test_crystal_mining_needs_diamond_pickaxe():
    env, params = make("Forager-v0")
    _, state = env.reset(jax.random.PRNGKey(91), params)
    blocks = np.asarray(state.blocks[W.ICE_REALM])
    # find a crystal with walkable ice below it
    for cy, cx in np.argwhere(blocks == W.CRYSTAL):
        if blocks[cy + 1, cx] == W.ICE:
            break
    else:
        raise AssertionError("no minable crystal found")
    below = state.replace(
        level=jnp.asarray(W.ICE_REALM, jnp.int32),
        pos=jnp.asarray([cy + 1, cx], jnp.int32),
        facing=jnp.asarray(0),
    )
    _, s1, _, _, _ = env.step(
        jax.random.PRNGKey(92), below, jnp.asarray(F.A_DO), params
    )
    assert int(s1.inventory[F.INV["crystal"]]) == 0, "bare hands mined crystal"
    armed = below.replace(
        inventory=below.inventory.at[F.INV["diamond_pickaxe"]].set(1)
    )
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(93), armed, jnp.asarray(F.A_DO), params
    )
    assert int(s2.inventory[F.INV["crystal"]]) == 1
    assert bool(s2.achievements[F._ACH["collect_crystal"]])
    assert int(s2.blocks[W.ICE_REALM, cy, cx]) == W.PATH


def test_ice_bolt_pierces_all_mobs_on_ray():
    """The ice bolt strikes EVERY mob along the ray (the fireball and bow
    stop at the nearest); kills bank XP and latch ice_kill."""
    env, params = make("Forager-v0")
    _, state = env.reset(jax.random.PRNGKey(94), params)
    y, x = 20, 20
    carved = state.blocks.at[W.SURFACE, y, x : x + 6].set(W.GRASS)
    # two 1-hp bats at range 2 and 4 along the facing-right ray
    state = state.replace(
        blocks=carved,
        pos=jnp.asarray([y, x], jnp.int32),
        facing=jnp.asarray(1),
        mob_pos=state.mob_pos.at[F.BATS.start].set(jnp.array([y, x + 2]))
        .at[F.BATS.start + 1].set(jnp.array([y, x + 4])),
        mob_level=state.mob_level.at[F.BATS.start].set(W.SURFACE)
        .at[F.BATS.start + 1].set(W.SURFACE),
        mob_alive=state.mob_alive.at[F.BATS.start].set(True)
        .at[F.BATS.start + 1].set(True),
        mob_health=state.mob_health.at[F.BATS.start].set(1)
        .at[F.BATS.start + 1].set(1),
        inventory=state.inventory.at[F.INV["frost_tome"]].set(1),
        mana=jnp.asarray(9, jnp.int32),
    )
    _, s1, r, _, _ = env.step(
        jax.random.PRNGKey(95), state, jnp.asarray(F.A_CAST_ICE), params
    )
    assert not bool(s1.mob_alive[F.BATS.start]), "near bat survived"
    assert not bool(s1.mob_alive[F.BATS.start + 1]), "pierce missed far bat"
    assert bool(s1.achievements[F._ACH["cast_ice_spell"]])
    assert bool(s1.achievements[F._ACH["ice_kill"]])
    assert bool(s1.achievements[F._ACH["defeat_bat"]])
    assert int(s1.mana) == 9 - F.ICE_COST
    assert int(s1.xp) == 2  # two bat kills x 1 XP
    # the fireball on the same setup only strikes the NEAR mob
    fire = state.replace(
        inventory=state.inventory.at[F.INV["spellbook"]].set(1)
    )
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(96), fire, jnp.asarray(F.A_CAST), params
    )
    assert not bool(s2.mob_alive[F.BATS.start])
    assert bool(s2.mob_alive[F.BATS.start + 1]), "fireball should not pierce"


def test_frost_tome_only_from_ice_chests():
    """Ice-realm chests drop the frost tome in the book slot; chests on
    other floors drop the fireball spellbook."""
    env, params = make("Forager-v0")
    _, state = env.reset(jax.random.PRNGKey(97), params)
    blocks = np.asarray(state.blocks[W.ICE_REALM])
    for cy, cx in np.argwhere(blocks == W.CHEST):
        if blocks[cy + 1, cx] == W.ICE:
            break
    else:
        raise AssertionError("no reachable ice chest")
    base = state.replace(
        level=jnp.asarray(W.ICE_REALM, jnp.int32),
        pos=jnp.asarray([cy + 1, cx], jnp.int32),
        facing=jnp.asarray(0),
    )
    got_tome = got_spellbook = False
    for seed in range(40):
        _, s1, _, _, _ = env.step(
            jax.random.PRNGKey(200 + seed), base, jnp.asarray(F.A_DO), params
        )
        got_tome |= int(s1.inventory[F.INV["frost_tome"]]) > 0
        got_spellbook |= int(s1.inventory[F.INV["spellbook"]]) > 0
        if int(s1.inventory[F.INV["frost_tome"]]) > 0:
            assert bool(s1.achievements[F._ACH["learn_ice_spell"]])
            assert not bool(s1.achievements[F._ACH["learn_spell"]])
    assert got_tome, "40 ice chests never dropped the frost tome"
    assert not got_spellbook, "ice chest dropped a fireball spellbook"


def test_xp_ladder_levels_and_melee_bonus():
    env, params = make("Forager-v0")
    _, state = env.reset(jax.random.PRNGKey(98), params)
    # 7 XP + a 1-XP bat kill crosses the level-2 threshold
    y, x = 20, 20
    carved = state.blocks.at[W.SURFACE, y, x : x + 3].set(W.GRASS)
    state = state.replace(
        blocks=carved,
        pos=jnp.asarray([y, x], jnp.int32),
        facing=jnp.asarray(1),
        xp=jnp.asarray(7, jnp.int32),
        mob_pos=state.mob_pos.at[F.BATS.start].set(jnp.array([y, x + 1])),
        mob_level=state.mob_level.at[F.BATS.start].set(W.SURFACE),
        mob_alive=state.mob_alive.at[F.BATS.start].set(True),
        mob_health=state.mob_health.at[F.BATS.start].set(1),
    )
    _, s1, _, _, _ = env.step(
        jax.random.PRNGKey(99), state, jnp.asarray(F.A_DO), params
    )
    assert int(s1.xp) == 8
    assert bool(s1.achievements[F._ACH["level_up"]])
    assert not bool(s1.achievements[F._ACH["veteran"]])
    # at 32+ XP the veteran feat latches on the next kill-bearing step
    vet = s1.replace(xp=jnp.asarray(32, jnp.int32))
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(100), vet, jnp.asarray(F.A_NOOP), params
    )
    assert bool(s2.achievements[F._ACH["veteran"]])
    # melee bonus: a level-5 player one-shots a zombie a level-1 can't.
    # Run at NIGHT — surface zombies despawn at dawn, which would read
    # as a phantom kill here.
    zy, zx = y, x + 1
    def zombie_state(xp):
        return state.replace(
            xp=jnp.asarray(xp, jnp.int32),
            time=jnp.asarray(160, jnp.int32),
            mob_pos=state.mob_pos.at[F.ZOMBIES.start].set(
                jnp.array([zy, zx])
            ),
            mob_level=state.mob_level.at[F.ZOMBIES.start].set(W.SURFACE),
            mob_alive=state.mob_alive.at[F.ZOMBIES.start]
            .set(True)
            .at[F.BATS.start]
            .set(False),
            mob_health=state.mob_health.at[F.ZOMBIES.start].set(5),
        )
    _, weak, _, _, _ = env.step(
        jax.random.PRNGKey(101), zombie_state(0), jnp.asarray(F.A_DO), params
    )
    assert bool(weak.mob_alive[F.ZOMBIES.start]), "level 1 one-shot a zombie"
    _, strong, _, _, _ = env.step(
        jax.random.PRNGKey(101), zombie_state(99), jnp.asarray(F.A_DO), params
    )
    assert not bool(strong.mob_alive[F.ZOMBIES.start])


def test_drink_all_potions_latches():
    env, params = make("Forager-v0")
    _, state = env.reset(jax.random.PRNGKey(102), params)
    state = state.replace(
        inventory=state.inventory.at[F.INV["potion_red"]].set(1)
        .at[F.INV["potion_green"]].set(1)
        .at[F.INV["potion_blue"]].set(1),
        health=jnp.asarray(9, jnp.int32),
    )
    for a in (F.A_DRINK_RED, F.A_DRINK_GREEN):
        _, state, _, _, _ = env.step(
            jax.random.PRNGKey(103), state, jnp.asarray(a), params
        )
    assert not bool(state.achievements[F._ACH["drink_all_potions"]])
    _, state, _, _, _ = env.step(
        jax.random.PRNGKey(104), state, jnp.asarray(F.A_DRINK_BLUE), params
    )
    assert bool(state.achievements[F._ACH["drink_all_potions"]])
    assert bool(state.achievements[F._ACH["drink_potion"]])


def test_ice_queen_fight_and_craft_all_tools():
    env, params = make("Forager-v0")
    _, state = env.reset(jax.random.PRNGKey(105), params)
    qy, qx = int(state.mob_pos[F.QUEEN, 0]), int(state.mob_pos[F.QUEEN, 1])
    # stand under the queen on the ice floor with a worn-down boss
    fight = state.replace(
        level=jnp.asarray(W.ICE_REALM, jnp.int32),
        pos=jnp.asarray([qy + 1, qx], jnp.int32),
        facing=jnp.asarray(0),
        mob_alive=state.mob_alive.at[F.QUEEN].set(True),
        mob_health=state.mob_health.at[F.QUEEN].set(1),
    )
    _, s1, _, _, _ = env.step(
        jax.random.PRNGKey(106), fight, jnp.asarray(F.A_DO), params
    )
    assert not bool(s1.mob_alive[F.QUEEN])
    assert bool(s1.achievements[F._ACH["defeat_ice_queen"]])
    assert int(s1.xp) == 5  # boss kill XP
    # craft_all_tools: the full pickaxe + sword racks latch the feat
    racks = state.replace(
        inventory=state.inventory.at[F.INV["wood_pickaxe"]].set(1)
        .at[F.INV["stone_pickaxe"]].set(1)
        .at[F.INV["iron_pickaxe"]].set(1)
        .at[F.INV["diamond_pickaxe"]].set(1)
        .at[F.INV["wood_sword"]].set(1)
        .at[F.INV["stone_sword"]].set(1)
        .at[F.INV["iron_sword"]].set(1)
        .at[F.INV["diamond_sword"]].set(1)
    )
    _, s2, _, _, _ = env.step(
        jax.random.PRNGKey(107), racks, jnp.asarray(F.A_NOOP), params
    )
    assert bool(s2.achievements[F._ACH["craft_all_tools"]])
