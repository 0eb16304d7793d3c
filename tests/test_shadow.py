"""Context-shading ray-cast (heatx.weather.shadow — extension; the
reference takes incident solar as an input and has no shading at all).
Geometry truths first, then the solar-model and IDF integrations."""

import numpy as np
import pytest

import heatx
from heatx.model.building import Boundary, BuildingModel, SurfaceDef
from heatx.model.building import Construction, Material, SpaceDef, Substance
from heatx.weather.shadow import _in_polygon, sample_points, sunlit_fraction


def _wall_model(with_shade=None):
    """One 10x3 m wall facing -y (south); optional shade polygons."""
    m = BuildingModel()
    m.add_substance(Substance(
        "c", thermal_conductivity=0.8, density=1700.0,
        specific_heat_capacity=800.0,
    ))
    m.add_material(Material("c20", "c", 0.2))
    m.add_construction(Construction("wall", ["c20"]))
    m.add_space(SpaceDef("room", 300.0))
    m.add_surface(SurfaceDef(
        "w", "wall", Boundary.outdoor(), Boundary.space_("room"),
        vertices=np.array(
            [[0, 0, 0], [10, 0, 0], [10, 0, 3], [0, 0, 3]], float
        ),
    ))
    for p in with_shade or []:
        m.add_shade(p)
    return m


def test_point_in_polygon():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    px = np.array([1.0, 3.0, -0.1, 1.999])
    py = np.array([1.0, 1.0, 1.0, 0.001])
    np.testing.assert_array_equal(
        _in_polygon(px, py, sq), [True, False, False, True]
    )
    # Concave L-shape: the notch is outside.
    L = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], float)
    assert _in_polygon(np.array(0.5), np.array(1.5), L)
    assert not _in_polygon(np.array(1.5), np.array(1.5), L)


def test_sample_points_interior():
    v = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 2], [0, 0, 2]], float)
    pts = sample_points(v)
    assert pts.shape == (5, 3)
    np.testing.assert_allclose(pts[0], [2, 0, 1])  # centroid
    assert (pts[:, 0] > 0).all() and (pts[:, 0] < 4).all()
    assert np.allclose(pts[:, 1], 0.0)  # stays in the plane


def test_full_screen_blocks_beam():
    """A large screen parallel to the wall, between it and the southern
    sun: fully blocked from the south, untouched from the north/at
    night; removing the screen restores 1.0 everywhere."""
    screen = np.array(
        [[-10, -2, -5], [20, -2, -5], [20, -2, 10], [-10, -2, 10]], float
    )
    m = _wall_model([screen])
    alt = np.radians([30.0, 30.0, -10.0])
    az = np.radians([180.0, 0.0, 180.0])  # south, north, night-south
    f = sunlit_fraction(m, alt, az)
    np.testing.assert_allclose(f[:, 0], [0.0, 1.0, 1.0])
    f0 = sunlit_fraction(_wall_model(), alt, az)
    np.testing.assert_allclose(f0, 1.0)


def test_overhang_high_sun_only():
    """A horizontal overhang at the wall top shades high sun, not low sun
    (the textbook passive-solar configuration)."""
    overhang = np.array(
        [[0, 0, 3], [10, 0, 3], [10, -2, 3], [0, -2, 3]], float
    )
    m = _wall_model([overhang])
    az = np.radians([180.0, 180.0])
    alt = np.radians([70.0, 10.0])
    f = sunlit_fraction(m, alt, az)
    assert f[0, 0] < 0.35  # high sun: mostly shaded
    assert f[1, 0] > 0.9  # low winter sun slips under


def test_self_shadowing_opt_in():
    """include_building=True lets the building's own massing shade it: a
    second wall due south of the first blocks southern sun; a surface
    never shades itself (every lone wall stays fully lit)."""
    m = _wall_model()
    m.add_surface(SurfaceDef(
        "blocker", "wall", Boundary.outdoor(), Boundary.space_("room"),
        vertices=np.array(
            [[0, -3, 0], [10, -3, 0], [10, -3, 5], [0, -3, 5]], float
        ),
    ))
    alt = np.radians([20.0])
    az = np.radians([180.0])
    f_off = sunlit_fraction(m, alt, az)
    np.testing.assert_allclose(f_off, 1.0)
    f_on = sunlit_fraction(m, alt, az, include_building=True)
    assert f_on[0, 0] == 0.0  # wall w fully behind the blocker
    assert f_on[0, 1] == 1.0  # the blocker itself is unshaded


def test_beam_fraction_scales_direct_only():
    from heatx.weather.solar import poa_irradiance

    kw = dict(
        dni=800.0, dhi=100.0, ghi=500.0, altitude_rad=np.radians(40.0),
        azimuth_rad=np.radians(180.0), normal_x=0.0, normal_y=-1.0,
        cos_tilt=0.0, albedo=0.2,
    )
    full = poa_irradiance(**kw)
    half = poa_irradiance(**kw, beam_fraction=0.5)
    dark = poa_irradiance(**kw, beam_fraction=0.0)
    diffuse_only = poa_irradiance(**{**kw, "dni": 0.0})
    assert dark == pytest.approx(diffuse_only)
    assert half == pytest.approx((full + dark) / 2.0)


def test_idf_shading_surfaces_and_cli(ref_fixtures, tmp_path, capsys):
    """Shading:*:Detailed polygons import as model.shades and the CLI
    ray-casts them: a big southern screen cools a sunny run."""
    import csv
    import os

    from heatx.cli import main
    from heatx.model.idf import load_idf

    EPW = f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw"
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    base = """
Timestep, 1;
Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
Construction, Wall, Concrete;
Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
BuildingSurface:Detailed, N-Wall, Wall, Wall, A, Outdoors, , Sun, Wind, 0,
    4, 10,5,3, 10,5,0, 0,5,0, 0,5,3;
"""
    shaded = base + """
Shading:Site:Detailed, Screen, , 4,
    -20,7,-5, 30,7,-5, 30,7,60, -20,7,60;
"""
    loaded = load_idf(shaded)
    (shade,) = loaded.model.shades
    assert shade.shape == (4, 3)
    # Zone-attached shading resolves the base surface's frame too.
    loaded2 = load_idf(base + """
Shading:Zone:Detailed, Fin, N-Wall, , 4,
    0,5,0, 0,8,0, 0,8,3, 0,5,3;
""")
    assert len(loaded2.model.shades) == 1
    with pytest.warns(UserWarning, match="treated as opaque"):
        load_idf(shaded.replace(
            "Shading:Site:Detailed, Screen, ,",
            "Shading:Site:Detailed, Screen, HalfOpen,",
        ) + "Schedule:Constant, HalfOpen, , 0.5;\n")

    temps = {}
    for tag, text in (("open", base), ("shaded", shaded)):
        p = tmp_path / f"{tag}.idf"
        p.write_text(text)
        o = tmp_path / f"{tag}.csv"
        assert main(["simulate", str(p), EPW, "--hours", "48", "--engine",
                     "xla", "--mode", "trbdf2", "--f64", "-o", str(o)]) == 0
        temps[tag] = np.asarray(
            [r[1] for r in list(csv.reader(open(o)))[1:]], float
        )
    assert "context shading: 1 polygon(s)" in capsys.readouterr().err
    # A north wall in Santiago (southern hemisphere) is the sunny facade:
    # screening its beam reads clearly in the 48 h mean.
    assert temps["shaded"].mean() < temps["open"].mean() - 0.1


def test_sizing_respects_context_shading(ref_fixtures):
    """A big screen on the sunny side reduces the sized summer cooling
    peak (design day AND annual method)."""
    from heatx.sizing import (
        annual_peak_loads,
        design_day_loads,
        design_days_from_epw,
    )
    from heatx.weather.epw import read_epw

    epw = read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")
    cfg = heatx.SimConfig(dtype=np.float64, interior_mrt=True)

    def north_wall_model(screen=False):
        m = BuildingModel()
        m.add_substance(Substance(
            "c", thermal_conductivity=0.8, density=1700.0,
            specific_heat_capacity=800.0,
        ))
        m.add_material(Material("c20", "c", 0.2))
        m.add_construction(Construction("wall", ["c20"]))
        m.add_space(SpaceDef("room", 300.0))
        m.add_surface(SurfaceDef(
            "n", "wall", Boundary.outdoor(), Boundary.space_("room"),
            vertices=np.array(
                [[10, 5, 3], [10, 5, 0], [0, 5, 0], [0, 5, 3]], float
            ),
        ))
        if screen:
            m.add_shade(np.array(
                [[-20, 7, -5], [30, 7, -5], [30, 7, 60], [-20, 7, 60]],
                float,
            ))
        return m

    days = design_days_from_epw(epw)
    dd_open = design_day_loads(north_wall_model(), days["summer"],
                               epw=epw, config=cfg)
    dd_scr = design_day_loads(north_wall_model(True), days["summer"],
                              epw=epw, config=cfg)
    assert float(dd_scr.peak_W[0]) < float(dd_open.peak_W[0])
    an_open = annual_peak_loads(north_wall_model(), epw, config=cfg)
    an_scr = annual_peak_loads(north_wall_model(True), epw, config=cfg)
    assert float(an_scr.peak_cooling_W[0]) < float(an_open.peak_cooling_W[0])
    # solar_scale multiplies on top (a 0-transmittance shade kills solar).
    an_dark = annual_peak_loads(
        north_wall_model(), epw, config=cfg,
        solar_scale=np.zeros((epw.n_hours, 1)),
    )
    assert float(an_dark.peak_cooling_W[0]) <= float(an_scr.peak_cooling_W[0])


def test_sky_view_fraction_per_face():
    """Per-FACE sky-view truths: no shades -> 1.0 everywhere; a huge
    canopy kills both faces' sky; a canopy over only the south half
    blocks the south-facing front face (~0) while the north face stays
    wide open (~1) — the urban-canyon case a merged factor would get
    wrong by 2x."""
    from heatx.weather.shadow import sky_view_fraction

    m = _wall_model()
    np.testing.assert_allclose(sky_view_fraction(m), 1.0)
    np.testing.assert_allclose(sky_view_fraction(m, side="back"), 1.0)

    canopy = np.array(
        [[-500, -500, 4], [500, -500, 4], [500, 500, 4], [-500, 500, 4]],
        float,
    )
    m2 = _wall_model([canopy])
    assert sky_view_fraction(m2)[0] < 0.05
    assert sky_view_fraction(m2, side="back")[0] < 0.05

    # South-half canopy: the wall's front face (normal -y) sees only the
    # covered half-dome; the back face sees the open north half.
    half = np.array(
        [[-500, -500, 4], [500, -500, 4], [500, 0, 4], [-500, 0, 4]], float
    )
    m3 = _wall_model([half])
    assert sky_view_fraction(m3)[0] < 0.05
    assert sky_view_fraction(m3, side="back")[0] > 0.95


def test_sky_view_scales_diffuse_and_longwave():
    from heatx.constants import SIGMA
    from heatx.weather.solar import longwave_irradiance, poa_irradiance

    kw = dict(
        dni=0.0, dhi=300.0, ghi=300.0, altitude_rad=np.radians(40.0),
        azimuth_rad=np.radians(180.0), normal_x=0.0, normal_y=-1.0,
        cos_tilt=0.0, albedo=0.0,
    )
    full = poa_irradiance(**kw)
    halved = poa_irradiance(**kw, sky_view=0.5)
    assert halved == pytest.approx(full * 0.5)
    # Longwave: zero sky view replaces the cold sky with an
    # air-temperature blackbody -> tilt-invariant e_air.
    t_air = 10.0
    ir_h = SIGMA * 263.15**4
    e_air = SIGMA * (t_air + 273.15) ** 4
    blocked = longwave_irradiance(ir_h, t_air, 0.0, sky_view=0.0)
    assert blocked == pytest.approx(e_air, rel=1e-12)
    open_sky = longwave_irradiance(ir_h, t_air, 0.0)
    partial = longwave_irradiance(ir_h, t_air, 0.0, sky_view=0.6)
    assert open_sky < partial < blocked  # colder sky -> less incident IR
