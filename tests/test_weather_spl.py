"""EPW reader, .spl parser, and glazing-node-distribution tests."""

import os

import numpy as np
import pytest

from heatx.build.layout import compile_building
from heatx.model.spl import load_spl, parse_spl
from heatx.weather.epw import interpolate_to_steps, read_epw
import heatx

EPW = "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"


@pytest.mark.skipif(not os.path.isfile(EPW), reason="EPW fixture unavailable")
def test_read_epw():
    w = read_epw(EPW)
    assert w.n_hours == 8760
    assert "Santiago" in w.location or "SANTIAGO" in w.location.upper()
    assert -10 < w.dry_bulb.min() and w.dry_bulb.max() < 45
    assert (w.wind_speed >= 0).all()
    assert (0 <= w.wind_direction_deg).all() and (w.wind_direction_deg <= 360).all()
    assert w.global_horizontal.max() > 500  # sunny climate
    assert (w.global_horizontal >= 0).all()


def test_interpolate_to_steps():
    v = np.array([0.0, 10.0, 20.0])
    out = interpolate_to_steps(v, 2)
    np.testing.assert_allclose(out, [0, 5, 10, 15, 20, 10])  # wraps at the end


def test_parse_spl_roundtrip(ref_fixtures):
    m = load_spl(f"{ref_fixtures}/tilted/back.spl")
    assert "Concrete" in m.substances
    assert m.spaces[0].volume == 600.0
    s = m.surfaces[0]
    assert s.back_boundary.kind == "space"
    area, perim, normal, height = s.resolved_geometry()
    assert abs(area - 60.0) < 1e-6
    assert abs(perim - 46.0) < 1e-6
    # 45-degree tilt, facing south-ish
    assert abs(normal[2] - np.sqrt(0.5)) < 1e-6

    # generic value parsing
    objs = parse_spl('Thing { a: 1.5, b: "x", c: [1, 2, 3], d: { e: "y" } }')
    assert objs == [("Thing", {"a": 1.5, "b": "x", "c": [1.0, 2.0, 3.0], "d": {"e": "y"}})]


def test_double_glazing_alpha_distribution():
    """Multi-layer glazing systems distribute per-layer absorbed fractions
    over each pane's nodes (surface.rs:465-537; heatx extends the reference,
    which panics on alternating systems, glazing.rs:470)."""
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, GasSubstance, Material,
        SpaceDef, Substance, SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(Substance("glass", thermal_conductivity=1.0, density=2500.0,
                              specific_heat_capacity=840.0, solar_transmittance=0.7,
                              front_solar_absorbtance=0.1, back_solar_absorbtance=0.1))
    m.add_substance(GasSubstance("argon", "argon"))
    m.add_material(Material("pane", "glass", 0.006))
    m.add_material(Material("gap", "argon", 0.012))
    m.add_construction(Construction("igu", ["pane", "gap", "pane"]))
    m.add_space(SpaceDef("z", 50.0))
    m.add_surface(SurfaceDef("w", "igu", Boundary.outdoor(), Boundary.space_("z"),
                             area=2.0, perimeter=6.0, normal=(0.0, -1.0, 0.0), height=1.5))
    b = compile_building(m, n=4, config=heatx.SimConfig(dtype=np.float64))
    sb = b.surfaces
    assert sb.has_cavity
    fa = np.asarray(sb.front_alphas)[:, 0]
    nn = int(sb.n_nodes[0])
    # nodes: pane(2 nodes) gas(1 segment) pane(2 nodes) -> 4 nodes
    assert nn == 4
    # both transparent panes receive absorption, spread over their 2 nodes
    assert fa[0] > 0 and fa[1] > 0 and fa[2] > 0 and fa[3] > 0
    np.testing.assert_allclose(fa[0], fa[1], rtol=1e-12)
    # front pane absorbs more of the front-incident radiation than the back
    assert fa[0] > fa[2]
    # total absorbed fraction below 1
    assert fa.sum() < 1.0


def test_epw_ground_temperatures():
    """The EPW GROUND TEMPERATURES header parses: 3 depths x 12 monthly C
    (the Santiago file tabulates 0.5/2/4 m)."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    epw = read_epw(EPW)
    assert sorted(epw.ground_temps) == [0.5, 2.0, 4.0]
    assert epw.ground_temps[0.5][0] == pytest.approx(18.03)
    assert epw.ground_temps[0.5][11] == pytest.approx(15.03)
    # Nearest-depth lookup; default = deepest (most damped).
    assert epw.ground_temperature(0.4)[0] == pytest.approx(18.03)
    np.testing.assert_array_equal(
        epw.ground_temperature(), epw.ground_temps[4.0]
    )


def test_monthly_to_hourly():
    from heatx.weather.epw import monthly_to_hourly

    monthly = np.arange(12, dtype=float)
    h = monthly_to_hourly(monthly)
    assert h.shape == (8760,)
    assert (h[: 31 * 24] == 0.0).all()  # January held
    assert h[31 * 24] == 1.0  # first February hour
    assert h[-1] == 11.0
    # Tiling wraps for multi-year horizons.
    h2 = monthly_to_hourly(monthly, hours=8760 + 24)
    assert (h2[8760:] == 0.0).all()
    # Leap years keep the month boundaries aligned (Feb = 29 days).
    h3 = monthly_to_hourly(monthly, hours=8784, leap=True)
    assert h3.shape == (8784,)
    assert h3[(31 + 28) * 24] == 1.0  # Feb 29 still February
    assert h3[-1] == 11.0  # Dec 31 of the leap year stays December
    with pytest.raises(ValueError):
        monthly_to_hourly(np.arange(11, dtype=float))


def test_set_ground_temperature_updates_marches():
    """Seasonal ground coupling: swapping the soil temperature between run
    segments changes the march without recompiling; warmer soil -> warmer
    slab zone."""
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, Material, SpaceDef, Substance,
        SurfaceDef,
    )

    def build():
        m = BuildingModel()
        m.add_substance(Substance("soil-slab", thermal_conductivity=1.4,
                                  density=2000.0, specific_heat_capacity=900.0))
        m.add_material(Material("slab20", "soil-slab", 0.2))
        m.add_construction(Construction("slab", ["slab20"]))
        m.add_space(SpaceDef("room", 100.0))
        verts = np.array([[0, 0, 0], [5, 0, 0], [5, 5, 0], [0, 5, 0]], float)
        m.add_surface(SurfaceDef("floor", "slab", Boundary.ground(10.0),
                                 Boundary.space_("room"), vertices=verts))
        return m

    tm = heatx.ThermalModel(build(), n=1,
                            config=heatx.SimConfig(dtype=np.float64))
    inp = tm.inputs(t_out=10.0)

    def run_month(tm, t_ground, state):
        tm.set_ground_temperature(t_ground)
        for _ in range(48):
            state = tm.march(state, inp)
        return state

    st_cold = run_month(tm, 5.0, tm.initial_state())
    st_warm = run_month(tm, 15.0, tm.initial_state())
    assert float(st_warm.zone_T[0]) > float(st_cold.zone_T[0]) + 0.5

    # No ground faces -> clear error.
    m2 = build()
    m2.surfaces[0].front_boundary = Boundary.outdoor()
    tm2 = heatx.ThermalModel(m2, n=1, config=heatx.SimConfig(dtype=np.float64))
    with pytest.raises(ValueError, match="ground"):
        tm2.set_ground_temperature(12.0)


def test_spl_devices_and_site(tmp_path):
    """SIMPLE .spl device objects load: Luminaire, HVAC (ElectricHeater and
    a setpoint IdealHeaterCooler), SiteDetails terrain; Building metadata is
    skipped.  The loaded model compiles and the thermostat controls."""
    spl = """
    Building { name: "test" }
    SiteDetails { terrain_class: "City" }
    Substance {
        type: "Normal", name: "Concrete", thermal_conductivity: 0.816,
        density: 1700., specific_heat_capacity: 800.,
    }
    Material { name: "C10", substance: "Concrete", thickness: 0.1 }
    Construction { name: "Wall", materials: ["C10"] }
    Space { name: "Room", volume: 300. }
    Space { name: "Attic", volume: 100. }
    Surface {
        name: "W", construction: "Wall",
        back_boundary: { type: "Space", space: "Room" },
        vertices: [ 0.,0.,0., 10.,0.,0., 10.,0.,3., 0.,0.,3. ]
    }
    Surface {
        name: "A", construction: "Wall",
        back_boundary: { type: "Space", space: "Attic" },
        vertices: [ 0.,5.,0., 10.,5.,0., 10.,5.,3., 0.,5.,3. ]
    }
    Luminaire { name: "lights", target_space: "Room", max_power: 120. }
    HVAC {
        type: "ElectricHeater", name: "heater", target_space: "Attic",
        max_heating_power: 2300.,
    }
    HVAC {
        type: "IdealHeaterCooler", name: "tstat", target_spaces: ["Room"],
        heating_setpoint: 19., cooling_setpoint: 27.,
    }
    """
    p = tmp_path / "m.spl"
    p.write_text(spl)
    m = load_spl(str(p))
    assert m.site_details.terrain == "city"
    assert [l.name for l in m.luminaires] == ["lights"]
    assert [h.name for h in m.hvacs] == ["heater", "tstat"]

    import heatx

    tm = heatx.ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    st = tm.initial_state()
    inp = tm.inputs(
        t_out=-5.0, wind_speed=3.0, ir_front=330.0,
        hvac_power=np.array([500.0, 0.0]), lum_power=np.array([120.0]),
    )
    for _ in range(12):
        st = tm.march(st, inp)
    zt = np.asarray(st.zone_T)
    assert np.isfinite(zt).all()
    # Room held at the 19 C heating setpoint by the ideal loads; the attic
    # floats with its 500 W heater.
    assert zt[0] >= 19.0 - 1e-9
    assert np.asarray(st.ideal_load)[0] > 0.0


def test_epw_missing_markers_and_truncation(tmp_path):
    """EPW missing-data markers substitute (hold last valid) instead of
    entering the physics as 9999 W/m2; truncated records raise instead of
    silently shifting the rest of the year."""
    import warnings

    header = "\n".join(
        ["LOCATION,X,,,,,-33.38,-70.78,-4.0,476.0"] + ["HDR"] * 7
    )

    def rec(dry=10.0, ir=350.0, ghi=100.0, dni=200.0, dhi=50.0, ws=3.0, wd=180.0):
        f = ["9"] * 35
        f[6], f[12], f[13], f[14], f[15], f[21], f[20] = (
            str(dry), str(ir), str(ghi), str(dni), str(dhi), str(ws), str(wd)
        )
        return ",".join(f)

    p = tmp_path / "w.epw"
    p.write_text(header + "\n" + "\n".join(
        [rec(), rec(dry=99.9, ir=9999.0), rec(dry=12.0)]
    ) + "\n")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        w = read_epw(str(p))
    assert w.dry_bulb[1] == 10.0  # held at the last valid value
    assert w.horizontal_ir[1] == 350.0
    assert w.dry_bulb[2] == 12.0
    assert any("missing-data" in str(c.message) for c in caught)

    # Leading missing records back-fill from the first valid one.
    p.write_text(header + "\n" + "\n".join([rec(dry=99.9), rec(dry=7.0)]) + "\n")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w2 = read_epw(str(p))
    assert w2.dry_bulb[0] == 7.0

    # A truncated record raises (line number included).
    p.write_text(header + "\n" + rec() + "\nbad,line\n" + rec() + "\n")
    with pytest.raises(ValueError, match="line 10"):
        read_epw(str(p))
    # A records-free file raises clearly.
    p.write_text(header + "\n")
    with pytest.raises(ValueError, match="no weather data"):
        read_epw(str(p))


def test_checkpoint_path_roundtrip(tmp_path):
    """save_state/load_state round-trip with the SAME path string (np.savez
    appends .npz; the loader must find it)."""
    from heatx.io.checkpoint import load_state, save_state
    from heatx.engine.state import SimState

    st = SimState(
        node_T=np.zeros((3, 2)), zone_T=np.array([21.0]),
        h_front=np.zeros(2), h_back=np.zeros(2),
        q_front=np.zeros(2), q_back=np.zeros(2),
    )
    base = str(tmp_path / "ckpt")
    actual = save_state(base, st, step=7)
    assert actual.endswith(".npz")
    st2, step = load_state(base)  # same string the caller passed
    assert step == 7 and float(st2.zone_T[0]) == 21.0


def test_spl_ground_temperature_honored(tmp_path):
    """A .spl Ground boundary's temperature field reaches the model."""
    from heatx.model.spl import _boundary_from

    b = _boundary_from({"type": "Ground", "temperature": 18.0})
    assert b.kind == "ground" and b.temperature == 18.0
    b2 = _boundary_from({"type": "Ground"})
    assert b2.temperature == 10.0


def test_duplicate_space_rejected():
    from heatx.model.building import BuildingModel, SpaceDef

    m = BuildingModel()
    m.add_space(SpaceDef("room", 100.0))
    with pytest.raises(ValueError, match="duplicate space"):
        m.add_space(SpaceDef("room", 200.0))
