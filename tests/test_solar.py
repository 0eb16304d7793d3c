"""Solar position + plane-of-array irradiance (heatx extension; the
reference takes per-surface irradiance as an input, surface.rs:916-931)."""

import numpy as np
import pytest

from heatx.weather import solar

DEG = np.pi / 180.0


def test_declination_extremes():
    # June 21 (n=172) ~ +23.45 deg, Dec 21 (n=355) ~ -23.45 deg (Cooper).
    assert abs(solar.declination(172) / DEG - 23.45) < 0.1
    assert abs(solar.declination(355) / DEG + 23.45) < 0.2
    # Equinoxes ~ 0 (within ~1 deg for the Cooper formula).
    assert abs(solar.declination(81) / DEG) < 1.0


def test_noon_altitude_and_azimuth():
    # Equator, equinox, solar noon: sun overhead (altitude ~ 90 deg).
    alt, _ = solar.solar_position(0.0, 0.0, 0.0, 81, 12.0)
    assert alt / DEG > 87.0
    # 40N, equinox, noon: altitude ~ 50 deg, azimuth ~ south (180 deg).
    alt, az = solar.solar_position(40.0, 0.0, 0.0, 81, 12.0)
    assert abs(alt / DEG - 50.0) < 1.5
    assert abs(az / DEG - 180.0) < 5.0
    # 40S: sun to the north at noon.
    alt_s, az_s = solar.solar_position(-40.0, 0.0, 0.0, 81, 12.0)
    assert abs(alt_s / DEG - 50.0) < 1.5
    assert (az_s / DEG < 10.0) or (az_s / DEG > 350.0)
    # Morning sun in the east, afternoon in the west (40N).
    _, az_am = solar.solar_position(40.0, 0.0, 0.0, 81, 8.0)
    _, az_pm = solar.solar_position(40.0, 0.0, 0.0, 81, 16.0)
    assert 45.0 < az_am / DEG < 135.0
    assert 225.0 < az_pm / DEG < 315.0
    # Night: negative altitude.
    alt_n, _ = solar.solar_position(40.0, 0.0, 0.0, 81, 0.5)
    assert alt_n < 0.0


def test_longitude_and_tz_shift_solar_noon():
    # 7.5 deg east of the zone meridian => solar noon ~30 min earlier.
    alt0, _ = solar.solar_position(40.0, 7.5, 0.0, 81, 11.5)
    alt1, _ = solar.solar_position(40.0, 7.5, 0.0, 81, 12.5)
    assert alt0 > alt1  # 11:30 local is nearer solar noon than 12:30


def test_poa_horizontal_consistency():
    # Horizontal surface: POA = DNI*sin(alt) + DHI (isotropic sky view = 1,
    # no ground term).
    alt, az = 35.0 * DEG, 200.0 * DEG
    poa = solar.poa_irradiance(800.0, 100.0, 550.0, alt, az, 0.0, 0.0, 1.0)
    assert abs(poa - (800.0 * np.sin(alt) + 100.0)) < 1e-9


def test_poa_orientation():
    # 40N noon: a south-facing vertical wall sees the direct beam, a
    # north-facing one only diffuse + ground.
    alt, az = solar.solar_position(40.0, 0.0, 0.0, 81, 12.0)
    south = solar.poa_irradiance(800.0, 100.0, 550.0, alt, az, 0.0, -1.0, 0.0)
    north = solar.poa_irradiance(800.0, 100.0, 550.0, alt, az, 0.0, 1.0, 0.0)
    assert south > north + 300.0
    assert abs(north - (100.0 / 2.0 + 550.0 * 0.2 / 2.0)) < 1e-9
    # At night the direct term vanishes even if DNI were nonzero.
    dark = solar.poa_irradiance(800.0, 0.0, 0.0, -5 * DEG, az, 0.0, -1.0, 0.0)
    assert dark == 0.0


def test_epw_location_and_surface_irradiance(ref_fixtures):
    import heatx
    from heatx.build.layout import compile_building
    from heatx.testing import SingleZoneOptions, TestMat, single_zone_building
    from heatx.weather.epw import read_epw

    epw = read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")
    assert abs(epw.latitude_deg + 33.38) < 1e-6
    assert abs(epw.longitude_deg + 70.78) < 1e-6
    assert abs(epw.tz_hours + 4.0) < 1e-6

    opts = SingleZoneOptions(construction=[TestMat.concrete(0.1)])
    b = compile_building(single_zone_building(opts), n=1,
                         config=heatx.SimConfig(dtype=np.float64))
    sol = solar.surface_irradiance(epw, b, hours=48)
    assert sol.shape == (48, b.n_surfaces)
    assert np.isfinite(sol).all() and (sol >= 0).all()
    # Night hours (no GHI) get zero; some daytime hour gets > 50 W/m2.
    night = epw.global_horizontal[:48] == 0.0
    assert np.all(sol[night] <= epw.diffuse_horizontal[:48][night][:, None] + 1e-9)
    assert sol.max() > 50.0
    # Santiago (33S): the south-facing test wall (normal (0,-1,0)) should
    # receive LESS annual beam than a mirrored north-facing wall would.
    # Build the comparison directly from poa on both orientations.
    h = np.arange(24 * 365, dtype=np.float64)
    alt, az = solar.solar_position(
        epw.latitude_deg, epw.longitude_deg, epw.tz_hours,
        (h // 24) % 365 + 1, h % 24 + 0.5)
    dni = np.tile(epw.direct_normal, 2)[: len(h)]
    south_total = solar.poa_irradiance(dni, 0.0, 0.0, alt, az, 0.0, -1.0, 0.0).sum()
    north_total = solar.poa_irradiance(dni, 0.0, 0.0, alt, az, 0.0, 1.0, 0.0).sum()
    assert north_total > 1.5 * south_total


# ---- Perez (1990) anisotropic sky ------------------------------------------


def test_perez_horizontal_identity():
    """On a horizontal plane the Perez transposition returns exactly DHI
    for any daytime sky: cos(theta_i) == cos(z), so a/b == 1 while z < 85deg
    and the (1-F1)+F1 terms collapse."""
    z = 40.0 * DEG
    F1, F2 = solar.perez_brightness_coefficients(700.0, 120.0, z, 172)
    d = solar.perez_sky_diffuse(120.0, 1.0, np.cos(z), z, F1, F2)
    assert abs(d - 120.0) < 1e-9


def test_perez_zero_coefficients_reduce_to_isotropic():
    """F1 = F2 = 0 degenerates to the Liu-Jordan dome term."""
    z = 55.0 * DEG
    for ct in (1.0, 0.5, 0.0, -0.3):
        d = solar.perez_sky_diffuse(200.0, ct, 0.3, z, 0.0, 0.0)
        assert abs(d - 200.0 * (1.0 + ct) / 2.0) < 1e-9


def test_perez_clear_sky_circumsolar_anisotropy():
    """Clear sky (high DNI): the sun-facing vertical wall must see MORE sky
    diffuse than the anti-sun wall (circumsolar brightening), and the
    clearness must land in a high epsilon bin (F1 > 0)."""
    z = 48.0 * DEG
    F1, F2 = solar.perez_brightness_coefficients(850.0, 90.0, z, 100)
    assert F1 > 0.2
    cos_inc_sun = np.sin(z)  # vertical wall facing the sun azimuth
    toward = solar.perez_sky_diffuse(90.0, 0.0, cos_inc_sun, z, F1, F2)
    away = solar.perez_sky_diffuse(90.0, 0.0, -cos_inc_sun, z, F1, F2)
    assert toward > away + 20.0


def test_perez_overcast_is_near_isotropic():
    """DNI = 0 puts epsilon in bin 1; the circumsolar factor is small, so
    a vertical wall's sky diffuse is within ~15% of the isotropic half-dome."""
    z = 30.0 * DEG
    F1, F2 = solar.perez_brightness_coefficients(0.0, 350.0, z, 1)
    assert 0.0 <= F1 < 0.35
    d = solar.perez_sky_diffuse(350.0, 0.0, 0.2, z, F1, F2)
    assert abs(d - 175.0) < 0.3 * 175.0
    # No diffuse -> no sky term and no NaNs.
    F1z, F2z = solar.perez_brightness_coefficients(0.0, 0.0, z, 1)
    assert F1z == 0.0 and F2z == 0.0
    assert solar.perez_sky_diffuse(0.0, 0.0, 0.2, z, F1z, F2z) == 0.0


def test_perez_poa_requires_day_and_matches_shape(ref_fixtures):
    import heatx
    from heatx.build.layout import compile_building
    from heatx.testing import SingleZoneOptions, TestMat, single_zone_building
    from heatx.weather.epw import read_epw

    with pytest.raises(ValueError):
        solar.poa_irradiance(
            500.0, 100.0, 400.0, 0.5, 3.0, 0.0, -1.0, 0.0, sky="perez"
        )
    with pytest.raises(ValueError):
        solar.poa_irradiance(
            500.0, 100.0, 400.0, 0.5, 3.0, 0.0, -1.0, 0.0, sky="bogus"
        )

    epw = read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")
    opts = SingleZoneOptions(construction=[TestMat.concrete(0.1)])
    b = compile_building(single_zone_building(opts), n=1,
                         config=heatx.SimConfig(dtype=np.float64))
    iso = solar.surface_irradiance(epw, b, hours=8760)
    per = solar.surface_irradiance(epw, b, hours=8760, sky="perez")
    assert per.shape == iso.shape
    assert np.isfinite(per).all() and (per >= 0).all()
    # The beam + ground terms are identical; only the sky diffuse differs,
    # and annually the two transpositions agree within ~15% on total
    # incident energy for a vertical wall.
    r = per.sum() / iso.sum()
    assert 0.85 < r < 1.20, r


def test_surface_irradiance_start_hour_offset(ref_fixtures):
    """start_hour evaluates hours [s, s+T) directly — identical to
    computing the prefix and slicing, without the wasted work."""
    import heatx
    from heatx.build.layout import compile_building
    from heatx.weather.epw import read_epw
    from heatx.weather.solar import surface_irradiance
    from test_sharding import multi_surface_model

    epw = read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")
    b = compile_building(
        multi_surface_model(4), n=1, config=heatx.SimConfig(dtype=np.float64)
    )
    full = surface_irradiance(epw, b, hours=200)
    part = surface_irradiance(epw, b, hours=80, start_hour=120)
    np.testing.assert_array_equal(full[120:200], part)


def test_longwave_tilt_blend():
    """Tilted incident longwave (EnergyPlus exterior LW view factors):
    a horizontal up-face sees the sky column exactly; a down-face sees a
    pure air-temperature blackbody; a vertical wall blends with
    F_sky = 0.5 and the sqrt(F_sky) sky/air split; and an isothermal
    environment (IR_h = sigma*T_air^4) is tilt-invariant."""
    from heatx.constants import SIGMA

    t_air = 10.0
    e_air = SIGMA * (t_air + 273.15) ** 4
    ir_h = SIGMA * (263.15) ** 4  # clear sky ~20 K colder

    up = solar.longwave_irradiance(ir_h, t_air, 1.0)
    np.testing.assert_allclose(up, ir_h, rtol=1e-14)
    down = solar.longwave_irradiance(ir_h, t_air, -1.0)
    np.testing.assert_allclose(down, e_air, rtol=1e-14)
    wall = solar.longwave_irradiance(ir_h, t_air, 0.0)
    beta = np.sqrt(0.5)
    np.testing.assert_allclose(
        wall, 0.5 * beta * ir_h + (0.5 * (1 - beta) + 0.5) * e_air,
        rtol=1e-14,
    )
    assert down > wall > up  # colder sky -> less incident IR with more sky view
    # Isothermal invariance at arbitrary tilt.
    for ct in (-0.7, -0.2, 0.3, 0.9):
        np.testing.assert_allclose(
            solar.longwave_irradiance(e_air, t_air, ct), e_air, rtol=1e-14
        )
    # Explicit ground temperature replaces the air-temperature ground term.
    warm = solar.longwave_irradiance(ir_h, t_air, 0.0, t_ground_c=30.0)
    assert warm > wall


def test_surface_longwave_shapes_and_sides(ref_fixtures):
    import heatx
    from heatx.build.layout import compile_building
    from heatx.constants import SIGMA
    from heatx.weather.epw import read_epw
    from test_sharding import multi_surface_model

    epw = read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")
    b = compile_building(
        multi_surface_model(4), n=1, config=heatx.SimConfig(dtype=np.float64)
    )
    irf = solar.surface_longwave(epw, b, hours=48)
    assert irf.shape == (48, b.n_surfaces)
    assert np.isfinite(irf).all() and (irf > 0).all()
    # Vertical walls: identical for front and back faces (F_sky = 0.5 both).
    ct = np.asarray(b.surfaces.cos_tilt)
    vert = np.abs(ct) < 1e-9
    if vert.any():
        irb = solar.surface_longwave(epw, b, hours=48, side="back")
        np.testing.assert_allclose(irf[:, vert], irb[:, vert], rtol=1e-14)
    # start_hour offset slices exactly.
    part = solar.surface_longwave(epw, b, hours=20, start_hour=17)
    np.testing.assert_array_equal(irf[17:37], part)
    # The blend sits between the raw sky column and the air blackbody.
    ir_h = np.asarray(epw.horizontal_ir[:48])
    e_air = SIGMA * (np.asarray(epw.dry_bulb[:48]) + 273.15) ** 4
    lo = np.minimum(ir_h, e_air)[:, None] - 1e-9
    hi = np.maximum(ir_h, e_air)[:, None] + 1e-9
    assert ((irf >= lo) & (irf <= hi)).all()
    # [T]-series ground temperature broadcasts.
    tg = np.full(48, 15.0)
    irg = solar.surface_longwave(epw, b, hours=48, t_ground_c=tg)
    assert irg.shape == irf.shape
