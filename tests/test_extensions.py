"""heatx extensions beyond the reference's capability surface.

The reference leaves three corners unimplemented: inter-zone air mixing
(model.rs:546 'unimplemented'), Boundary::Ground (model.rs:92
``unimplemented!()``), and the r-value of gas-cavity constructions
(discretization.rs:310 ``todo!()``).  heatx implements all three as
documented extensions; these tests pin their physics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import heatx
from heatx.build.layout import compile_building
from heatx.engine import state as state_mod, step as step_mod
from heatx.model.building import (
    Boundary,
    BuildingModel,
    Construction,
    ElectricHeater,
    Material,
    SpaceDef,
    Substance,
    SurfaceDef,
)


def _two_zone_model(mixing=None):
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c15", "concrete", 0.15))
    m.add_construction(Construction("wall", ["c15"]))
    verts = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    for z in range(2):
        m.add_space(SpaceDef(f"z{z}", 100.0))
        m.add_surface(
            SurfaceDef(f"s{z}", "wall", Boundary.outdoor(),
                       Boundary.space_(f"z{z}"), vertices=verts)
        )
    m.add_hvac(ElectricHeater("h0", "z0"))  # only zone 0 heated
    if mixing is not None:
        m.add_mixing("z0", "z1", mixing)
    return m


def _march_hours(tm, hours, hvac_w):
    st = tm.initial_state()
    inp = tm.inputs(t_out=0.0, wind_speed=2.0, ir_front=320.0,
                    hvac_power=np.array([hvac_w]))
    for _ in range(hours):
        st = tm.march(st, inp)
    return np.asarray(st.zone_T)


def test_mixing_pulls_zones_together():
    cfg = heatx.SimConfig(dtype=np.float64)
    base = _march_hours(heatx.ThermalModel(_two_zone_model(), n=1, config=cfg), 24, 1000.0)
    mixed = _march_hours(
        heatx.ThermalModel(_two_zone_model(mixing=0.05), n=1, config=cfg), 24, 1000.0
    )
    # Without mixing, only z0 is warm; with it, heat moves z0 -> z1.
    assert base[0] - base[1] > 5.0
    assert mixed[1] > base[1] + 1.0  # z1 warmed by mixed air
    assert mixed[0] < base[0]  # z0 gave up heat
    assert mixed[0] - mixed[1] < base[0] - base[1]
    # Strong mixing nearly equalizes.
    strong = _march_hours(
        heatx.ThermalModel(_two_zone_model(mixing=2.0), n=1, config=cfg), 24, 1000.0
    )
    assert strong[0] - strong[1] < 0.5


def test_mixing_kernel_matches_xla():
    """The in-kernel mixing matrix must reproduce the XLA segment-sum path."""
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(_two_zone_model(mixing=0.08), n=1, config=cfg)
    st = tm.initial_state()
    inp = tm.inputs(t_out=-5.0, wind_speed=2.0, ir_front=320.0,
                    hvac_power=np.array([800.0]))
    s_xla = st
    for _ in range(6):
        s_xla = tm.march(s_xla, inp)
    fr = tm.fast_runner(block_size=8, mode="parity", interpret=True)
    s_k = st
    for _ in range(6):
        s_k = fr.march(s_k, inp)
    assert np.max(np.abs(np.asarray(s_xla.zone_T) - np.asarray(s_k.zone_T))) < 1e-9
    assert np.max(np.abs(np.asarray(s_xla.node_T) - np.asarray(s_k.node_T))) < 1e-9


def test_ground_boundary():
    """A ground-contact floor couples the zone to the soil temperature via
    the contact coefficient, with no wind/radiation sensitivity."""
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("slab", "concrete", 0.15))
    m.add_construction(Construction("floor", ["slab"]))
    m.add_space(SpaceDef("room", 100.0))
    m.add_surface(
        SurfaceDef("slab0", "floor", Boundary.ground(temperature=12.0),
                   Boundary.space_("room"),
                   vertices=np.array([[0, 0, 0], [5, 0, 0], [5, 5, 0], [0, 5, 0]], float))
    )
    tm = heatx.ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    # Contact coefficient rides the fixed-h channel; the default 20 W/m2K is
    # the largest film conductance the explicit stability search covers.
    assert np.allclose(tm.building.surfaces.fixed_h_front, 20.0)
    st = tm.initial_state()
    inp = tm.inputs(t_out=-20.0, wind_speed=9.0)
    for _ in range(24 * 10):
        st = tm.march(st, inp)
    zT = float(st.zone_T[0])
    # The zone only touches the slab: it must settle at the soil temperature,
    # regardless of the brutal outdoor air (which touches nothing).
    assert abs(zT - 12.0) < 0.2, zT
    # Ground face pinned to soil T through the contact coefficient.
    assert abs(float(st.node_T[0, 0]) - 12.0) < 0.05


def _ground_slab_model(ground_on_back: bool):
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("slab", "concrete", 0.15))
    m.add_construction(Construction("floor", ["slab"]))
    m.add_space(SpaceDef("room", 100.0))
    m.add_hvac(ElectricHeater("h0", "room"))
    gnd = Boundary.ground(temperature=12.0)
    room = Boundary.space_("room")
    front, back = (room, gnd) if ground_on_back else (gnd, room)
    m.add_surface(
        SurfaceDef("slab0", "floor", front, back,
                   vertices=np.array([[0, 0, 0], [5, 0, 0], [5, 5, 0], [0, 5, 0]], float))
    )
    return m


def test_ground_back_boundary_symmetric():
    """Ground as the BACK boundary must behave exactly like the mirrored
    front-ground model: the soil face radiates/convects against the soil, not
    against the front environment (the replicate_ambient_back_bug quirk,
    surface.rs:672-686, must not leak onto ground faces)."""
    cfg = heatx.SimConfig(dtype=np.float64)
    finals = []
    for ground_on_back in (False, True):
        tm = heatx.ThermalModel(_ground_slab_model(ground_on_back), n=1, config=cfg)
        side = tm.building.surfaces
        fixed = side.fixed_h_back if ground_on_back else side.fixed_h_front
        assert np.allclose(fixed, 20.0)
        st = tm.initial_state()
        inp = tm.inputs(hvac_power=np.array([1500.0]))
        for _ in range(24 * 8):
            st = tm.march(st, inp)
        finals.append(float(st.zone_T[0]))
    assert abs(finals[0] - finals[1]) < 0.05, finals


def test_cavity_r_value():
    """r_value of a double-glazing construction evaluates the ISO 15099
    cavity U at the given temperatures (reference: todo!() panic)."""
    from heatx.model.building import GasSubstance

    m = BuildingModel()
    m.add_substance(
        Substance("glass", thermal_conductivity=1.0, density=2500.0,
                  specific_heat_capacity=840.0, solar_transmittance=0.7,
                  front_solar_absorbtance=0.1, back_solar_absorbtance=0.1)
    )
    m.add_substance(GasSubstance("argon", "argon"))
    m.add_material(Material("pane", "glass", 0.006))
    m.add_material(Material("gap", "argon", 0.012))
    m.add_construction(Construction("igu", ["pane", "gap", "pane"]))
    m.add_space(SpaceDef("room", 50.0))
    m.add_fenestration(
        SurfaceDef("w", "igu", Boundary.outdoor(), Boundary.space_("room"),
                   vertices=np.array([[0, 0, 1], [1, 0, 1], [1, 0, 2], [0, 0, 2]], float))
    )
    b = compile_building(m, n=2, config=heatx.SimConfig(dtype=np.float64))
    r = b.discretizations[0].r_value()
    # Two 6 mm panes (0.006 each) + an argon gap a few tenths m2K/W.
    assert 0.1 < r < 0.6, r
    # Temperature dependence: a hotter cavity convects/radiates more -> lower R.
    r_hot = b.discretizations[0].r_value(t_front=35.0, t_back=25.0)
    assert r_hot < r


def test_space_index_survives_rename():
    """Regression: the name->index cache is verified against the live
    space list, so renaming/replacing a space (same count) cannot return a
    stale index or miss the new name."""
    from heatx.model.building import BuildingModel, SpaceDef

    m = BuildingModel()
    m.add_space(SpaceDef("a", 10.0))
    m.add_space(SpaceDef("b", 20.0))
    assert m.space_index("b") == 1  # warm the cache
    m.spaces[1] = SpaceDef("renamed", 20.0)
    assert m.space_index("renamed") == 1
    try:
        m.space_index("b")
        assert False, "stale name should no longer resolve"
    except KeyError:
        pass


def test_set_fixed_h_exempts_ground_faces():
    """The debug h-override must not clobber (or NaN-strip) the compiled
    soil-contact coefficient on ground faces."""
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("slab", "concrete", 0.15))
    m.add_construction(Construction("floor", ["slab"]))
    m.add_space(SpaceDef("room", 100.0))
    verts = np.array([[0, 0, 0], [5, 0, 0], [5, 5, 0], [0, 5, 0]], float)
    m.add_surface(SurfaceDef("slab0", "floor", Boundary.ground(temperature=12.0),
                             Boundary.space_("room"), vertices=verts))
    m.add_surface(SurfaceDef("wall0", "floor", Boundary.outdoor(),
                             Boundary.space_("room"), vertices=verts))
    tm = heatx.ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    b = tm.building
    b.set_fixed_h(front=10.0, back=10.0)
    assert float(b.surfaces.fixed_h_front[0]) == 20.0  # ground face kept
    assert float(b.surfaces.fixed_h_front[1]) == 10.0  # ordinary face pinned
    b.set_fixed_h(front=np.nan, back=np.nan)  # unset the override
    assert float(b.surfaces.fixed_h_front[0]) == 20.0  # soil contact survives
    assert np.isnan(b.surfaces.fixed_h_front[1])


def test_masked_airflow_nan_temperature_is_inert():
    """A masked-off infiltration/ventilation channel carrying NaN in its
    temperature (the natural 'absent' encoding) must not poison the zone
    gains (0 * NaN)."""
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c"]))
    m.add_space(SpaceDef("room", 100.0))
    m.add_surface(SurfaceDef(
        "w", "wall", Boundary.outdoor(), Boundary.space_("room"),
        vertices=np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float),
    ))
    tm = heatx.ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    st = tm.initial_state()
    inp = tm.inputs(t_out=0.0, wind_speed=2.0,
                    inf_vol=0.1, inf_temp=np.nan, inf_mask=False)
    for _ in range(4):
        st = tm.march(st, inp)
    assert np.isfinite(float(st.zone_T[0]))
    # And through the FastRunner gains preprocessing.
    from heatx.api import FastRunner

    fr = FastRunner(tm, block_size=8, mode="trbdf2", substeps=4)
    seq = tm.inputs_sequence(4, t_out=np.zeros(4), wind_speed=np.full(4, 2.0),
                             inf_vol=0.1, inf_temp=np.nan, inf_mask=False)
    stk, zt = fr.run(tm.initial_state(), seq)
    assert np.all(np.isfinite(np.asarray(zt)))


def test_inverted_scheduled_setpoints_rejected():
    """A transposed setpoint schedule (heat >= cool) is rejected host-side:
    under jit the heating branch would silently win every sub-step."""
    from heatx.model.building import IdealHeaterCooler

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c"]))
    m.add_space(SpaceDef("room", 100.0))
    m.add_surface(SurfaceDef(
        "w", "wall", Boundary.outdoor(), Boundary.space_("room"),
        vertices=np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float),
    ))
    m.add_hvac(IdealHeaterCooler("t", ["room"], heat_setpoint=20.0,
                                 cool_setpoint=26.0))
    tm = heatx.ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    T = 4
    seq = tm.inputs_sequence(
        T, t_out=np.zeros(T), heat_sp=np.full((T, 1), 26.0),
        cool_sp=np.full((T, 1), 20.0),
    )
    with pytest.raises(ValueError, match="heating setpoint >= cooling"):
        tm.run(tm.initial_state(), seq)
    from heatx.api import FastRunner

    fr = FastRunner(tm, block_size=8, mode="trbdf2", substeps=4,
                    scheduled_setpoints=True)
    with pytest.raises(ValueError, match="heating setpoint >= cooling"):
        fr.run(tm.initial_state(), seq)
    # A valid schedule still runs.
    ok = tm.inputs_sequence(T, t_out=np.zeros(T),
                            heat_sp=np.full((T, 1), 18.0))
    tm.run(tm.initial_state(), ok)


def test_default_inputs_none_override_noop():
    """Explicit None overrides keep the defaults instead of crashing."""
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c"]))
    m.add_space(SpaceDef("room", 100.0))
    m.add_surface(SurfaceDef(
        "w", "wall", Boundary.outdoor(), Boundary.space_("room"),
        vertices=np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float),
    ))
    tm = heatx.ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    inp = tm.inputs(t_out=3.0, mix_vol=None, heat_sp=None)
    assert float(inp.t_out) == 3.0 and inp.heat_sp is None
