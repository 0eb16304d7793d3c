"""Solar position and plane-of-array irradiance (heatx extension).

The reference takes per-surface incident solar as an *input* — the SIMPLE
ecosystem's separate solar module computes it (surface.rs:916-931 reads the
irradiance state channels; nothing in the heat crate computes sun geometry).
heatx ships the standard model so annual EPW runs are self-contained:

* solar position from the Cooper (1969) declination + Spencer (1971)
  equation of time + hour-angle formulas (Duffie & Beckman eq. 1.6.1 et
  seq.) — the same textbook chain EnergyPlus and PVLIB implement;
* plane-of-array irradiance with the isotropic-sky (Liu-Jordan) transposition:
  ``POA = DNI*max(cos theta, 0) + DHI*(1+cos beta)/2 + GHI*rho*(1-cos beta)/2``.

Azimuth convention matches the rest of heatx (EPW wind direction): compass
radians from north, clockwise, so a direction ``a`` is the horizontal unit
vector ``(sin a, cos a)`` in the building's (x=east, y=north) frame —
see physics.convection.is_windward.

Everything is plain numpy on the host (weather preprocessing, like the EPW
reader); the [T, S] result feeds StepInputs.sol_front/back.
"""

from __future__ import annotations

import numpy as np

_DEG = np.pi / 180.0


def declination(day_of_year):
    """Solar declination, radians (Cooper 1969; D&B eq. 1.6.1a)."""
    n = np.asarray(day_of_year, np.float64)
    return 23.45 * _DEG * np.sin(2.0 * np.pi * (284.0 + n) / 365.0)


def equation_of_time_minutes(day_of_year):
    """Equation of time in minutes (Spencer 1971; D&B eq. 1.5.3)."""
    b = 2.0 * np.pi * (np.asarray(day_of_year, np.float64) - 1.0) / 365.0
    return 229.2 * (
        0.000075
        + 0.001868 * np.cos(b)
        - 0.032077 * np.sin(b)
        - 0.014615 * np.cos(2.0 * b)
        - 0.04089 * np.sin(2.0 * b)
    )


def solar_position(latitude_deg, longitude_deg, tz_hours, day_of_year, local_hour):
    """Sun direction for local-standard-time hours.

    Returns ``(altitude_rad, azimuth_rad)`` with azimuth compass-style
    (from north, clockwise; east = pi/2).  All arguments broadcast.
    """
    phi = np.asarray(latitude_deg, np.float64) * _DEG
    dec = declination(day_of_year)
    # Local standard time -> solar time: 4 min per degree of longitude east
    # of the zone meridian, plus the equation of time.
    solar_time = (
        np.asarray(local_hour, np.float64)
        + (np.asarray(longitude_deg, np.float64) - 15.0 * np.asarray(tz_hours, np.float64))
        * 4.0
        / 60.0
        + equation_of_time_minutes(day_of_year) / 60.0
    )
    omega = (solar_time - 12.0) * 15.0 * _DEG  # hour angle, afternoon positive

    sin_alt = np.sin(phi) * np.sin(dec) + np.cos(phi) * np.cos(dec) * np.cos(omega)
    sin_alt = np.clip(sin_alt, -1.0, 1.0)
    altitude = np.arcsin(sin_alt)
    # Sun unit vector, horizon frame (x=east, y=north, z=up).
    east = -np.cos(dec) * np.sin(omega)
    north = np.sin(dec) * np.cos(phi) - np.cos(dec) * np.cos(omega) * np.sin(phi)
    azimuth = np.arctan2(east, north) % (2.0 * np.pi)
    return altitude, azimuth


def sun_vector(altitude_rad, azimuth_rad):
    """(x=east, y=north, z=up) unit vector from altitude/azimuth."""
    ca = np.cos(altitude_rad)
    return (
        ca * np.sin(azimuth_rad),
        ca * np.cos(azimuth_rad),
        np.sin(altitude_rad),
    )


def poa_irradiance(
    dni, dhi, ghi, altitude_rad, azimuth_rad, normal_x, normal_y, cos_tilt,
    albedo=0.2,
):
    """Plane-of-array irradiance, isotropic-sky (Liu-Jordan) transposition.

    Time arrays broadcast against surface arrays: pass time as [T, 1] and
    surfaces as [S] to get [T, S].  ``(normal_x, normal_y, cos_tilt)`` is the
    3-D unit outward normal in heatx's frame (cos_tilt = z-component, the
    same stored per surface in SurfaceBatch).
    """
    sx, sy, sz = sun_vector(altitude_rad, azimuth_rad)
    cos_inc = sx * normal_x + sy * normal_y + sz * cos_tilt
    up = np.asarray(altitude_rad) > 0.0
    direct = np.asarray(dni) * np.clip(cos_inc, 0.0, None) * up
    sky = np.asarray(dhi) * (1.0 + cos_tilt) / 2.0
    ground = np.asarray(ghi) * albedo * (1.0 - cos_tilt) / 2.0
    return direct + sky + ground


def surface_irradiance(epw, building, albedo=0.2, hours=None, side="front"):
    """Per-surface incident solar from an EPW: the [T, S] ``sol_front``
    input for a compiled building (front faces are the outdoor side in
    heatx's layout convention).  ``side="back"`` evaluates the opposite
    faces (negated normals) for models whose outdoor boundary is the back.

    EPW records are hour-ending local standard time; sun position is
    evaluated at the middle of each hour.  ``hours`` tiles/truncates the
    annual series (default: the EPW's own length).
    """
    sb = building.surfaces
    T = int(hours) if hours is not None else epw.n_hours
    reps = int(np.ceil(T / epw.n_hours))

    def tile(v):
        return np.tile(np.asarray(v, np.float64), reps)[:T]

    dni, dhi, ghi = tile(epw.direct_normal), tile(epw.diffuse_horizontal), tile(
        epw.global_horizontal
    )
    h = np.arange(T, dtype=np.float64)
    day = (np.floor(h / 24.0) % 365.0) + 1.0
    local_hour = (h % 24.0) + 0.5
    alt, az = solar_position(
        epw.latitude_deg, epw.longitude_deg, epw.tz_hours, day, local_hour
    )
    sign = 1.0 if side == "front" else -1.0
    nx = sign * np.asarray(sb.normal[:, 0], np.float64)
    ny = sign * np.asarray(sb.normal[:, 1], np.float64)
    ct = sign * np.asarray(sb.cos_tilt, np.float64)
    return poa_irradiance(
        dni[:, None], dhi[:, None], ghi[:, None],
        alt[:, None], az[:, None], nx[None, :], ny[None, :], ct[None, :],
        albedo=albedo,
    )
