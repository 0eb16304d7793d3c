"""Randomized kernel-vs-XLA parity sweep.

The targeted tests pin known configurations; this sweep draws random (but
valid) buildings — randomized layer stacks incl. insulation skins, multi-run
no-mass stacks (3+ no-mass nodes per chunk, which exercises the full solver
instead of the closed-form pair solve), double glazing with gas cavities,
mixed boundary kinds (outdoor / space / ambient / ground), fenestrations,
HVAC/luminaire gains and inter-zone mixing — and demands that the fused
Pallas kernel (interpret mode) reproduces the XLA reference-parity path.

Seeded and deterministic; each case marches 3 main steps at f64.
"""

import numpy as np
import pytest

import heatx
from heatx.model.building import (
    Boundary,
    BuildingModel,
    Construction,
    ElectricHeater,
    GasSubstance,
    Luminaire,
    Material,
    SpaceDef,
    Substance,
    SurfaceDef,
)

VERTS = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
TILTED = np.array([[0, 0, 0], [4, 0, 0], [4, 2, 2], [0, 2, 2]], float)


def _random_model(rng: np.random.Generator) -> BuildingModel:
    m = BuildingModel()
    m.add_substance(
        Substance("heavy", thermal_conductivity=rng.uniform(0.5, 2.0),
                  density=rng.uniform(1200, 2400),
                  specific_heat_capacity=rng.uniform(700, 1000),
                  front_thermal_absorbtance=0.9, back_thermal_absorbtance=0.9,
                  front_solar_absorbtance=0.7, back_solar_absorbtance=0.7)
    )
    m.add_substance(
        Substance("light", thermal_conductivity=rng.uniform(0.02, 0.06),
                  density=rng.uniform(10, 60),
                  specific_heat_capacity=rng.uniform(800, 2400),
                  front_thermal_absorbtance=0.9, back_thermal_absorbtance=0.9,
                  front_solar_absorbtance=0.6, back_solar_absorbtance=0.6)
    )
    m.add_substance(
        Substance("glass", thermal_conductivity=1.0, density=2500.0,
                  specific_heat_capacity=840.0,
                  solar_transmittance=rng.uniform(0.5, 0.85),
                  front_solar_absorbtance=0.1, back_solar_absorbtance=0.1,
                  front_thermal_absorbtance=0.84, back_thermal_absorbtance=0.84)
    )
    m.add_substance(GasSubstance("argon", "argon"))
    m.add_material(Material("mass", "heavy", rng.uniform(0.08, 0.25)))
    m.add_material(Material("skin", "light", rng.uniform(0.01, 0.04)))
    m.add_material(Material("skin2", "light", rng.uniform(0.01, 0.04)))
    m.add_material(Material("pane", "glass", 0.006))
    m.add_material(Material("gap", "argon", rng.uniform(0.008, 0.016)))

    m.add_construction(Construction("massive", ["mass"]))
    m.add_construction(Construction("mixed", ["skin", "mass", "skin2"]))
    # Adjacent no-mass solids -> a no-mass RUN longer than 2 nodes (forces
    # the padded-system solver; the pair solve is statically ineligible).
    m.add_construction(Construction("multiskin", ["skin", "skin2", "skin"]))
    m.add_construction(Construction("igu", ["pane", "gap", "pane"]))

    n_zones = int(rng.integers(2, 4))
    for z in range(n_zones):
        m.add_space(SpaceDef(f"z{z}", float(rng.uniform(60, 300))))

    kinds = ["massive", "mixed", "multiskin"]
    boundary_draws = [
        lambda z: Boundary.outdoor(),
        lambda z: Boundary.space_(f"z{z}"),
        lambda z: Boundary.ambient(float(rng.uniform(-5, 30))),
        lambda z: Boundary.ground(temperature=float(rng.uniform(5, 15))),
    ]
    n_surf = int(rng.integers(4, 9))
    for si in range(n_surf):
        kind = kinds[int(rng.integers(0, len(kinds)))]
        z = int(rng.integers(0, n_zones))
        # Front: anything; back: space (so every zone stays coupled) or any.
        front = boundary_draws[int(rng.integers(0, 4))](
            int(rng.integers(0, n_zones))
        )
        back = (
            Boundary.space_(f"z{z}")
            if si < n_zones or rng.random() < 0.7
            else boundary_draws[int(rng.integers(0, 3))](z)
        )
        verts = TILTED if rng.random() < 0.3 else VERTS
        m.add_surface(SurfaceDef(f"s{si}", kind, front, back, vertices=verts))
    for z in range(n_zones):
        # keep every zone attached to at least one surface
        m.add_surface(
            SurfaceDef(f"anchor{z}", "massive", Boundary.outdoor(),
                       Boundary.space_(f"z{z}"), vertices=VERTS)
        )
    m.add_fenestration(
        SurfaceDef("w0", "igu", Boundary.outdoor(), Boundary.space_("z0"),
                   vertices=np.array([[0, 0, 1], [1, 0, 1], [1, 0, 2], [0, 0, 2]], float))
    )
    m.add_hvac(ElectricHeater("h0", "z0"))
    m.add_luminaire(Luminaire("l0", f"z{n_zones - 1}"))
    if n_zones >= 2 and rng.random() < 0.5:
        m.add_mixing("z0", "z1", float(rng.uniform(0.01, 0.1)))
    return m


def _fuzz_case(seed, base, **cfg_kw):
    rng = np.random.default_rng(base + seed)
    m = _random_model(rng)
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2, **cfg_kw)
    tm = heatx.ThermalModel(m, n=2, config=cfg)
    return rng, tm


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_fuzz_kernel_matches_xla(seed):
    rng, tm = _fuzz_case(seed, 1000)
    fr = tm.fast_runner(block_size=16, mode="parity", interpret=True)

    S = tm.building.n_surfaces
    st_x = tm.initial_state()
    st_k = tm.initial_state()
    for step in range(3):
        inp = tm.inputs(
            t_out=float(rng.uniform(-10, 25)),
            wind_speed=float(rng.uniform(0, 8)),
            wind_direction=float(rng.uniform(0, 2 * np.pi)),
            sol_front=rng.uniform(0, 400, S),
            ir_front=rng.uniform(250, 400, S),
            hvac_power=np.array([float(rng.uniform(0, 1000))]),
            lum_power=np.array([float(rng.uniform(0, 300))]),
        )
        st_x = tm.march(st_x, inp)
        st_k = fr.march(st_k, inp)

    mask = np.asarray(tm.building.surfaces.node_mask)
    assert np.all(np.isfinite(np.asarray(st_x.zone_T)))
    np.testing.assert_allclose(
        np.asarray(st_k.zone_T), np.asarray(st_x.zone_T), atol=1e-8,
        err_msg=f"seed {seed}: zone temps",
    )
    np.testing.assert_allclose(
        np.asarray(st_k.node_T) * mask, np.asarray(st_x.node_T) * mask,
        atol=1e-8, err_msg=f"seed {seed}: node temps",
    )
    np.testing.assert_allclose(
        np.asarray(st_k.h_front), np.asarray(st_x.h_front), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(st_k.q_back), np.asarray(st_x.q_back), atol=1e-7
    )


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(3))
def test_fuzz_kernel_matches_xla_interior_mrt(seed):
    """The same randomized sweep with the Carroll MRT network driving the
    interior longwave physics: random participation patterns (multi-zone,
    ambient/ground faces excluded, both-sides-space partitions) must agree
    between the fused kernel and the XLA path."""
    rng, tm = _fuzz_case(seed, 2000, interior_mrt=True)
    fr = tm.fast_runner(block_size=16, mode="parity", interpret=True)
    S = tm.building.n_surfaces
    st_x = tm.initial_state()
    st_k = tm.initial_state()
    for step in range(3):
        inp = tm.inputs(
            t_out=float(rng.uniform(-10, 25)),
            wind_speed=float(rng.uniform(0, 8)),
            wind_direction=float(rng.uniform(0, 2 * np.pi)),
            sol_front=rng.uniform(0, 400, S),
            ir_front=rng.uniform(250, 400, S),
            hvac_power=np.array([float(rng.uniform(0, 1000))]),
            lum_power=np.array([float(rng.uniform(0, 300))]),
        )
        st_x = tm.march(st_x, inp)
        st_k = fr.march(st_k, inp)
    mask = np.asarray(tm.building.surfaces.node_mask)
    assert np.all(np.isfinite(np.asarray(st_x.zone_T)))
    np.testing.assert_allclose(
        np.asarray(st_k.zone_T), np.asarray(st_x.zone_T), atol=1e-8,
        err_msg=f"seed {seed}: zone temps (interior_mrt)",
    )
    np.testing.assert_allclose(
        np.asarray(st_k.node_T) * mask, np.asarray(st_x.node_T) * mask,
        atol=1e-8, err_msg=f"seed {seed}: node temps (interior_mrt)",
    )
