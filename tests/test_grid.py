import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.ops import grid as grid_lib
from nerfshop_tpu.ops import coords


def test_create_and_bitfield_threshold():
    g = grid_lib.OccupancyGrid.create(2)
    # plant density in one cell of cascade 0
    density = g.density.at[0, 10, 20, 30].set(1.0)
    g = g._replace(density=density)
    g = grid_lib.update_bitfield(g)
    occ = np.asarray(g.occupancy)
    assert occ[0, 10, 20, 30]
    assert occ[0].sum() == 1
    # max-pool OR into the coarser cascade's center octant:
    # fine cell (10,20,30) → pooled (5,10,15) → coarse (32+5, 32+10, 32+15)
    assert occ[1, 37, 42, 47]


def test_ema_update_decays_everywhere():
    """Reference semantics (ema_grid_samples_nerf runs over the WHOLE grid):
    every cell decays each update; sampled cells take max with fresh."""
    g = grid_lib.OccupancyGrid.create(1)
    density = g.density.at[0, 0, 0, 0].set(1.0).at[0, 1, 1, 1].set(1.0)
    fresh = jnp.zeros_like(density).at[0, 0, 0, 0].set(5.0)
    sampled = jnp.zeros_like(density, bool).at[0, 0, 0, 0].set(True)
    new = grid_lib.ema_update(density, fresh, sampled, decay=0.9)
    assert float(new[0, 0, 0, 0]) == 5.0  # fresh max wins
    assert float(new[0, 1, 1, 1]) == np.float32(0.9)  # unsampled still decays


def test_dense_grid_clears_to_field():
    """A fully-dense warm-up grid converges to the true field's occupancy
    after ~90 decay updates (0.95^90 < 0.01) — the deadlock the old
    decay-only-sampled semantics caused."""

    def density_fn(pos):
        return jnp.where(jnp.linalg.norm(pos - 0.5, axis=-1) < 0.2, 100.0, 0.0)

    g = grid_lib.OccupancyGrid.create(1)
    g = g._replace(density=jnp.full_like(g.density, 1.0))
    rng = jax.random.PRNGKey(0)
    for i in range(95):
        rng, k = jax.random.split(rng)
        g = grid_lib.update_density_grid(g, density_fn, k, 1, full_refresh=False)
    g = grid_lib.update_bitfield(g)
    frac = float(g.occupancy.mean())
    assert 0.01 < frac < 0.08, frac  # ≈ ball volume, air cleared


def test_slab_refresh_covers_all_cells_in_4_updates(rng):
    """Steady-state updates roll a R/4 z-slab: four updates with distinct
    offsets refresh every cell exactly once."""

    def density_fn(pos):
        return jnp.full(pos.shape[:-1], 7.0)

    g = grid_lib.OccupancyGrid.create(1)
    keys = [jax.random.PRNGKey(i) for i in range(64)]
    for k in keys:
        g = grid_lib.update_density_grid(g, density_fn, k, 1, full_refresh=False)
        # every cell decays between its slab refreshes: steady state is
        # [7·decay^k, 7] — require every slab was eventually refreshed
        if float(jnp.min(g.density)) > 7.0 * 0.95**8:
            break
    assert float(jnp.min(g.density)) > 7.0 * 0.95**8


def test_update_density_grid_with_synthetic_field(rng):
    """Density field = ball at center → occupancy concentrated there."""

    def density_fn(pos):
        return jnp.where(jnp.linalg.norm(pos - 0.5, axis=-1) < 0.2, 100.0, 0.0)

    g = grid_lib.OccupancyGrid.create(1)
    g = g._replace(density=jnp.zeros_like(g.density))
    g = grid_lib.update_density_grid(g, density_fn, rng, 1, 0, full_refresh=True)
    g = grid_lib.update_bitfield(g)
    occ = np.asarray(g.occupancy[0])
    # center occupied, corner not
    assert occ[64, 64, 64]
    assert not occ[5, 5, 5]
    # occupancy fraction ≈ ball volume = (4/3)π·0.2³ ≈ 3.3%
    frac = occ.mean()
    assert 0.02 < frac < 0.06


def test_occupancy_lookup_matches_cells(rng):
    g = grid_lib.OccupancyGrid.create(2)
    density = jnp.zeros_like(g.density).at[0, 64, 64, 64].set(10.0)
    g = grid_lib.update_bitfield(g._replace(density=density))
    pos = jnp.asarray([[0.5039, 0.5039, 0.5039]])  # center of cell (64,64,64)
    assert bool(grid_lib.occupancy_at(g, pos, jnp.asarray([0]))[0])
    assert not bool(grid_lib.occupancy_at(g, jnp.asarray([[0.1, 0.1, 0.1]]), jnp.asarray([0]))[0])


def test_partial_refresh_updates_slab(rng):
    calls = []

    def density_fn(pos):
        calls.append(pos.shape)
        return jnp.full(pos.shape[:-1], 5.0)

    g = grid_lib.OccupancyGrid.create(1)
    g = grid_lib.update_density_grid(g, density_fn, rng, 1, full_refresh=False)
    # density_fn runs under lax.map in fixed-size chunks (padded)
    assert calls[0][1] == 3
    # exactly one z-slab (¼ of cells) got the new density
    assert float(jnp.max(g.density)) == 5.0
    frac = float(jnp.mean((g.density == 5.0).astype(jnp.float32)))
    assert abs(frac - 0.25) < 1e-6
