"""Fused Pallas hour-kernel vs the XLA substep path (interpret mode on CPU).

Same building, same inputs, one hour of sub-steps: node temperatures, zone
temperatures, and observability channels must agree to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import heatx
from heatx.build.layout import compile_building
from heatx.build.blocking import build_blocks
from heatx.engine import state as state_mod, step as step_mod
from heatx.model.building import (
    Boundary,
    BuildingModel,
    Construction,
    ElectricHeater,
    Luminaire,
    Material,
    SpaceDef,
    Substance,
    SurfaceDef,
)
from heatx.ops import pallas_step


def city_model(n_zones=5, per_zone=4):
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0, front_thermal_absorbtance=0.9,
                  back_thermal_absorbtance=0.9, front_solar_absorbtance=0.7,
                  back_solar_absorbtance=0.7)
    )
    m.add_substance(
        Substance("poly", thermal_conductivity=0.0252, density=17.5,
                  specific_heat_capacity=2400.0, front_thermal_absorbtance=0.9,
                  back_thermal_absorbtance=0.9, front_solar_absorbtance=0.7,
                  back_solar_absorbtance=0.7)
    )
    m.add_material(Material("c20", "concrete", 0.2))
    m.add_material(Material("p2", "poly", 0.02))
    m.add_construction(Construction("massive", ["c20"]))
    m.add_construction(Construction("mixed", ["p2", "c20", "p2"]))
    verts = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    kinds = ["massive"] * (per_zone - 1) + ["mixed"]
    for z in range(n_zones):
        m.add_space(SpaceDef(f"z{z}", 150.0 + 10 * z))
        for si, kind in enumerate(kinds):
            m.add_surface(
                SurfaceDef(f"s{z}_{si}", kind, Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
        m.add_hvac(ElectricHeater(f"h{z}", f"z{z}"))
        m.add_luminaire(Luminaire(f"l{z}", f"z{z}"))
    # one partition wall connecting z0 and z1 (exercises component grouping)
    m.add_surface(
        SurfaceDef("partition", "massive", Boundary.space_("z0"),
                   Boundary.space_("z1"), vertices=verts)
    )
    return m


@pytest.mark.slow
def test_hour_kernel_cavity_matches_xla():
    """Gas-cavity (double-glazing) constructions through the kernel: cavity
    U-values re-evaluate per iteration in-kernel and must match the XLA path."""
    from heatx.model.building import GasSubstance

    m = city_model(3, 3)
    m.add_substance(
        Substance("glass", thermal_conductivity=1.0, density=2500.0,
                  specific_heat_capacity=840.0, solar_transmittance=0.7,
                  front_solar_absorbtance=0.1, back_solar_absorbtance=0.1,
                  front_thermal_absorbtance=0.84, back_thermal_absorbtance=0.84)
    )
    m.add_substance(GasSubstance("argon", "argon"))
    m.add_material(Material("pane", "glass", 0.006))
    m.add_material(Material("gap", "argon", 0.012))
    m.add_construction(Construction("igu", ["pane", "gap", "pane"]))
    verts = np.array([[0, 0, 1], [2, 0, 1], [2, 0, 2], [0, 0, 2]], float)
    for z in range(3):
        m.add_fenestration(
            SurfaceDef(f"win{z}", "igu", Boundary.outdoor(),
                       Boundary.space_(f"z{z}"), vertices=verts)
        )

    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2)
    building = compile_building(m, n=4, config=cfg).astype(np.float64)
    assert building.surfaces.has_cavity
    bb = pallas_step.block_building(building, block_size=16)
    sub = building.dt_subdivisions
    S = building.n_surfaces

    state = state_mod.initial_state(building)
    inputs = state_mod.default_inputs(
        building, t_out=-2.0, wind_speed=2.0,
        sol_front=np.full(S, 200.0), ir_front=np.full(S, 320.0),
    )
    ref = step_mod.march(building, state, inputs)

    hour_march, params = pallas_step.make_hour_march(bb, interpret=True)
    lay = bb.layout
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(state.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(state.zone_T)))
    az = jnp.zeros((bb.n_blocks, bb.zones_per_block))
    hour_inputs = (
        jnp.full((sub,), -2.0), jnp.full((sub,), 2.0), jnp.zeros((sub,)),
        jnp.asarray(lay.surfaces_to_blocked(np.full(S, 200.0))),
        jnp.asarray(lay.surfaces_to_blocked(np.zeros(S))),
        jnp.asarray(lay.surfaces_to_blocked(np.full(S, 320.0))),
        jnp.asarray(lay.surfaces_to_blocked(np.zeros(S))),
        az, az,
    )
    T1, zT1, _, _ = hour_march(params, T0, zT0, hour_inputs)
    zone_T = lay.zones_from_blocked(np.asarray(zT1), building.n_zones)
    node_T = lay.surfaces_from_blocked(np.asarray(T1), S)
    np.testing.assert_allclose(zone_T, np.asarray(ref.zone_T), atol=5e-8)
    np.testing.assert_allclose(
        node_T * np.asarray(building.surfaces.node_mask),
        np.asarray(ref.node_T) * np.asarray(building.surfaces.node_mask),
        atol=5e-8,
    )


@pytest.mark.slow
def test_hour_kernel_exact_adaptive_loop_matches_xla(monkeypatch):
    """The reference-exact adaptive no-mass while_loop running INSIDE the
    fused hour kernel (experimental opt-in HEATX_KERNEL_WHILE=1) matches
    the XLA path's exact loop — numerics, not just the fixed-iteration
    regime.  On hardware this measures ~122 s annual-equivalent at bench
    scale vs ~650 s for the same exact numerics on the XLA path (PERF.md)."""
    monkeypatch.setenv("HEATX_KERNEL_WHILE", "1")
    m = city_model(3, 3)
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=None)
    building = compile_building(m, n=4, config=cfg).astype(np.float64)
    assert building.surfaces.has_nomass
    bb = pallas_step.block_building(building, block_size=16)
    sub = building.dt_subdivisions
    S = building.n_surfaces

    state = state_mod.initial_state(building)
    inputs = state_mod.default_inputs(
        building, t_out=-2.0, wind_speed=2.0,
        sol_front=np.full(S, 200.0), ir_front=np.full(S, 320.0),
    )
    ref = step_mod.march(building, state, inputs)

    hour_march, params = pallas_step.make_hour_march(bb, interpret=True)
    lay = bb.layout
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(state.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(state.zone_T)))
    az = jnp.zeros((bb.n_blocks, bb.zones_per_block))
    hour_inputs = (
        jnp.full((sub,), -2.0), jnp.full((sub,), 2.0), jnp.zeros((sub,)),
        jnp.asarray(lay.surfaces_to_blocked(np.full(S, 200.0))),
        jnp.asarray(lay.surfaces_to_blocked(np.zeros(S))),
        jnp.asarray(lay.surfaces_to_blocked(np.full(S, 320.0))),
        jnp.asarray(lay.surfaces_to_blocked(np.zeros(S))),
        az, az,
    )
    T1, zT1, _, _ = hour_march(params, T0, zT0, hour_inputs)
    zone_T = lay.zones_from_blocked(np.asarray(zT1), building.n_zones)
    node_T = lay.surfaces_from_blocked(np.asarray(T1), S)
    np.testing.assert_allclose(zone_T, np.asarray(ref.zone_T), atol=5e-8)
    np.testing.assert_allclose(
        node_T * np.asarray(building.surfaces.node_mask),
        np.asarray(ref.node_T) * np.asarray(building.surfaces.node_mask),
        atol=5e-8,
    )


def test_blocking_structure():
    model = city_model(5, 4)
    b = compile_building(
        model, n=4, config=heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2)
    )
    layout = build_blocks(b, block_size=16)
    # z0+z1 are one component (9 surfaces); others 4 surfaces each
    assert layout.n_blocks >= 2
    # every surface's zones are local to its block
    S = b.n_surfaces
    for sp in range(layout.padded_surfaces):
        s = layout.surf_perm[sp]
        if s < 0:
            continue
        bi = sp // layout.block_size
        for code, space in [
            (b.surfaces.front_code[s], b.surfaces.front_space[s]),
            (b.surfaces.back_code[s], b.surfaces.back_space[s]),
        ]:
            if code == 1:  # B_SPACE
                assert space in set(layout.zone_table[bi]), (sp, s, bi)
    # round trip
    v = np.arange(b.n_zones, dtype=np.float64) + 3.0
    assert np.allclose(layout.zones_from_blocked(layout.zones_to_blocked(v), b.n_zones), v)
    sv = np.arange(S, dtype=np.float64)
    assert np.allclose(layout.surfaces_from_blocked(layout.surfaces_to_blocked(sv), S), sv)


@pytest.mark.slow
def test_hour_kernel_matches_xla_path():
    model = city_model(5, 4)
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2)
    building = compile_building(model, n=4, config=cfg).astype(np.float64)
    bb = pallas_step.block_building(building, block_size=16)
    sub = building.dt_subdivisions

    S = building.n_surfaces
    rng = np.random.default_rng(0)
    t_out = np.asarray(5.0 + rng.uniform(-1, 1, sub))
    wind = np.asarray(3.0 + rng.uniform(0, 1, sub))
    wdir = np.asarray(rng.uniform(0, 2 * np.pi, sub))
    sol_f = rng.uniform(0, 300, S)
    ir_f = np.full(S, 350.0)
    hvac = rng.uniform(0, 800, building.n_hvacs)
    lum = rng.uniform(0, 200, building.n_luminaires)

    # ---- XLA path (one march with per-substep weather arrays)
    state = state_mod.initial_state(building)
    inputs = state_mod.default_inputs(
        building,
        t_out=t_out,
        wind_speed=wind,
        wind_direction=wdir,
        sol_front=sol_f,
        ir_front=ir_f,
        hvac_power=hvac,
        lum_power=lum,
    )
    ref = step_mod.march(building, state, inputs)

    # ---- Pallas path (interpret mode)
    hour_march, params = pallas_step.make_hour_march(bb, interpret=True)
    lay = bb.layout
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(state.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(state.zone_T)))

    # per-zone hourly gains (hvac + luminaire; no infiltration here)
    a_gain = np.zeros(building.n_zones)
    np.add.at(a_gain, building.hvac_pair_space, hvac[building.hvac_pair_unit])
    np.add.at(a_gain, building.lum_space, lum)
    a_extra = jnp.asarray(lay.zones_to_blocked(a_gain))
    b_extra = jnp.zeros_like(a_extra)

    hour_inputs = (
        jnp.asarray(t_out),
        jnp.asarray(wind),
        jnp.asarray(wdir),
        jnp.asarray(lay.surfaces_to_blocked(sol_f)),
        jnp.asarray(lay.surfaces_to_blocked(np.zeros(S))),
        jnp.asarray(lay.surfaces_to_blocked(ir_f)),
        jnp.asarray(lay.surfaces_to_blocked(np.zeros(S))),
        a_extra,
        b_extra,
    )
    T1, zT1, (hf, hb, qf, qb), _ = hour_march(params, T0, zT0, hour_inputs)

    node_T = lay.surfaces_from_blocked(np.asarray(T1), S)
    zone_T = lay.zones_from_blocked(np.asarray(zT1), building.n_zones)

    # zone tolerance covers the kernel's series-form expm1 (no Mosaic
    # lowering for the primitive) vs jnp.expm1 on the XLA path
    np.testing.assert_allclose(zone_T, np.asarray(ref.zone_T), rtol=0, atol=5e-8)
    np.testing.assert_allclose(
        node_T * np.asarray(building.surfaces.node_mask),
        np.asarray(ref.node_T) * np.asarray(building.surfaces.node_mask),
        rtol=0,
        atol=5e-8,
    )
    np.testing.assert_allclose(
        lay.surfaces_from_blocked(np.asarray(hf), S), np.asarray(ref.h_front), atol=5e-8
    )
    np.testing.assert_allclose(
        lay.surfaces_from_blocked(np.asarray(qb), S), np.asarray(ref.q_back), atol=5e-7
    )
