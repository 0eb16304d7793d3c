"""Trombe-wall construction (concrete | air gap | glass).

The reference's trombe replay fixture is a missing large blob and its test is
commented out (validate_wall_heat_transfer.rs:996-1115); the construction
itself also panics the reference's glazing length check (glazing.rs:470).
heatx supports it: the back glazing scan collects [glass, concrete], the gas
gap gets an ISO 15099 cavity U-value, and solar absorbed through the glass
heats the massive concrete.  This test checks the physical behavior on both
the XLA path and (interpret-mode) the fused kernel.
"""

import numpy as np
import pytest

import heatx
from heatx.model.building import (
    Boundary, BuildingModel, Construction, GasSubstance, Material,
    SpaceDef, Substance, SurfaceDef,
)


def trombe_model():
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0,
                  front_thermal_absorbtance=0.9, back_thermal_absorbtance=0.9,
                  front_solar_absorbtance=0.7, back_solar_absorbtance=0.7)
    )
    m.add_substance(
        Substance("glass", thermal_conductivity=1.0, density=2500.0,
                  specific_heat_capacity=840.0, solar_transmittance=0.82,
                  front_solar_absorbtance=0.08, back_solar_absorbtance=0.08,
                  front_thermal_absorbtance=0.84, back_thermal_absorbtance=0.84)
    )
    m.add_substance(GasSubstance("air", "air"))
    # back-to-front: interior concrete mass | air gap | exterior glass pane
    m.add_material(Material("c20", "concrete", 0.2))
    m.add_material(Material("gap", "air", 0.05))
    m.add_material(Material("pane", "glass", 0.03))
    m.add_construction(Construction("trombe", ["pane", "gap", "c20"]))
    m.add_space(SpaceDef("room", 600.0))
    verts = np.array([[0, 0, 0], [20, 0, 0], [20, 0, 3], [0, 0, 3]], float)
    m.add_surface(
        SurfaceDef("trombe-wall", "trombe", Boundary.outdoor(),
                   Boundary.space_("room"), vertices=verts)
    )
    return m


def test_trombe_marches_and_collects_solar():
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(trombe_model(), n=4, config=cfg)
    sb = tm.building.surfaces
    # 3 cm glass is itself massive at this timestep (same discretization
    # decision the reference would make); the cavity is the no-mass-free gap
    assert sb.has_cavity and sb.has_massive

    # Solar distribution: the glass pane absorbs a little across its 2 nodes,
    # most transmitted absorption lands on the concrete's outer face (node 2)
    fa = np.asarray(sb.front_alphas)[:, 0]
    nn = int(sb.n_nodes[0])
    glass_nodes = fa[:2]
    concrete_face = fa[2]
    assert glass_nodes.sum() > 0
    assert concrete_face > glass_nodes.sum()  # tau=0.82 * alpha=0.7 dominates
    assert fa[3:nn].sum() == 0  # opaque layer keeps it on the face node

    st = tm.initial_state()
    ir = heatx.constants.SIGMA * (10.0 + 273.15) ** 4
    sunny = tm.inputs(t_out=10.0, wind_speed=1.0,
                      sol_front=np.array([600.0]), ir_front=np.array([ir]))
    dark = tm.inputs(t_out=10.0, wind_speed=1.0, ir_front=np.array([ir]))

    for _ in range(6 * 4):  # 6 sunny hours
        st = tm.march(st, sunny)
    t_concrete_face = float(st.node_T[2, 0])
    t_zone_after_sun = float(st.zone_T[0])
    assert t_concrete_face > 25.0  # the mass collected solar heat
    # heat keeps flowing into the room after dark (thermal flywheel)
    for _ in range(2 * 4):
        st = tm.march(st, dark)
    assert float(st.zone_T[0]) > t_zone_after_sun - 1.0
    assert float(st.q_back[0]) > 0.0  # still delivering into the room
    assert np.isfinite(np.asarray(st.node_T)).all()


@pytest.mark.slow
def test_trombe_kernel_matches_xla():
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2)
    tm = heatx.ThermalModel(trombe_model(), n=4, config=cfg)
    fr = tm.fast_runner(block_size=8)
    st = tm.initial_state()
    ir = heatx.constants.SIGMA * (10.0 + 273.15) ** 4
    inputs = tm.inputs(t_out=10.0, wind_speed=1.0,
                       sol_front=np.array([600.0]), ir_front=np.array([ir]))
    ref = tm.march(st, inputs)
    fast = fr.march(st, inputs)
    np.testing.assert_allclose(np.asarray(fast.zone_T), np.asarray(ref.zone_T), atol=5e-8)
    mask = np.asarray(tm.building.surfaces.node_mask)
    np.testing.assert_allclose(
        np.asarray(fast.node_T) * mask, np.asarray(ref.node_T) * mask, atol=5e-7
    )


def test_trombe_fast_mode_tracks_parity():
    """TR-BDF2 fast mode on the trombe wall: the gas-cavity U freezes per
    main step (vs per sub-step on the parity path) — the marched state must
    stay physical and track parity closely."""
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(trombe_model(), n=4, config=cfg)
    inputs = tm.inputs(
        t_out=np.float64(5.0),
        wind_speed=np.float64(2.0),
        sol_front=np.full(tm.building.n_surfaces, 400.0),
    )
    stp = tm.initial_state()
    stf = tm.initial_state()
    for _ in range(8 * 4):  # 8 hours of 15-minute main steps
        stp = tm.march(stp, inputs)
        stf = tm.march_imp(stf, inputs, substeps=4)
    zp, zf = float(stp.zone_T[0]), float(stf.zone_T[0])
    assert np.all(np.isfinite(np.asarray(stf.node_T)))
    assert abs(zp - zf) < 0.3, (zp, zf)
    # solar is collecting in both
    assert zf > 22.0 and zp > 22.0
