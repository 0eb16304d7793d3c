"""Gas thermophysical properties and ISO 15099 cavity convection.

TPU-native re-design of the reference gas module
(/root/reference/src/gas.rs).  Instead of an enum of gases dispatched at
runtime, every gas is a flat vector of polynomial coefficients so that a
*batch* of cavities — each potentially filled with a different gas — evaluates
as pure vectorized arithmetic with no control flow.  The piecewise Nusselt
correlation (gas.rs:197-315) becomes a set of branch-free ``jnp.where``
selections, which is what XLA wants.

All temperature arguments are in Kelvin unless noted.  Every function works
elementwise on arrays of any (broadcastable) shape and is safe to ``vmap``,
``jit`` and differentiate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from heatx.constants import KELVIN, PI

# Universal gas constant used by ISO 15099 Eq. 55 (gas.rs:176).
_R: float = 8314.46261815324
_G: float = 9.81


class GasProps(NamedTuple):
    """Linear-polynomial description of a gas (gas.rs:27-42).

    Each property is ``p0 + p1 * T[K]``.  Represented as a flat tuple of
    scalars (or arrays, for a batch of per-cavity gases).
    """

    k0: float  # thermal conductivity intercept, W/m.K
    k1: float  # thermal conductivity slope
    mu0: float  # dynamic viscosity intercept, N.s/m^2
    mu1: float  # dynamic viscosity slope
    cp0: float  # specific heat intercept, J/kg.K
    cp1: float  # specific heat slope
    molar_mass: float  # kg/kMol

    def as_array(self):
        import numpy as np

        return np.array(list(self), dtype=np.float64)


# Gas constants (gas.rs:45-74).
AIR = GasProps(2.873e-3, 7.760e-5, 3.723e-6, 4.94e-8, 1002.7370, 1.2324e-2, 28.97)
ARGON = GasProps(2.285e-3, 5.149e-5, 3.379e-6, 6.451e-8, 521.9285, 0.0, 39.948)
KRYPTON = GasProps(9.443e-4, 2.826e-5, 2.213e-6, 7.777e-8, 248.0907, 0.0, 83.8)
XENON = GasProps(4.538e-4, 1.723e-5, 1.069e-6, 7.414e-8, 158.3397, 0.0, 131.30)

GASES = {"air": AIR, "argon": ARGON, "krypton": KRYPTON, "xenon": XENON}


def thermal_conductivity(gas: GasProps, temp_k):
    """lambda(T), W/m.K (gas.rs:155-157)."""
    return gas.k0 + gas.k1 * temp_k


def dynamic_viscosity(gas: GasProps, temp_k):
    """mu(T), N.s/m^2 (gas.rs:160-162)."""
    return gas.mu0 + gas.mu1 * temp_k


def heat_capacity(gas: GasProps, temp_k):
    """cp(T), J/kg.K (gas.rs:165-167)."""
    return gas.cp0 + gas.cp1 * temp_k


def density(gas: GasProps, temp_k):
    """Ideal-gas density at 101325 Pa (ISO 15099 Eq. 55; gas.rs:175-179)."""
    return 101325.0 * gas.molar_mass / (_R * temp_k)


def rayleigh(gas: GasProps, t_front_c, t_back_c, thickness):
    """Rayleigh number of a gas cavity (ISO 15099 Eq. 40; gas.rs:82-102).

    ``t_front_c``/``t_back_c`` in Celsius (interchangeable).  Returns 1e-7
    when the faces are (numerically) isothermal, exactly like the reference.
    """
    dt = jnp.abs(t_front_c - t_back_c)
    temp = (t_front_c + t_back_c) / 2.0 + KELVIN
    beta = 1.0 / temp
    c_p = heat_capacity(gas, temp)
    mu = dynamic_viscosity(gas, temp)
    lam = thermal_conductivity(gas, temp)
    rho = density(gas, temp)
    ra = rho * rho * thickness**3 * _G * beta * c_p * dt / (mu * lam)
    return jnp.where(dt < 1e-10, 1e-7, ra)


def _relu(x):
    # aux(x) = (x + |x|)/2 (gas.rs:234)
    return jnp.maximum(x, 0.0)


def _nu_0_60(ra, gamma, a_gi):
    """Nusselt for tilt 0..60 deg (ISO 15099 Eq. 43-44; gas.rs:227-244)."""
    del a_gi
    cos_g = jnp.cos(gamma)
    # Guard: this branch is only selected for gamma < 60deg where cos > 0,
    # but we must avoid NaN/Inf in the unselected lanes.
    safe = jnp.maximum(ra * cos_g, 1e-30)
    a = _relu(1.0 - 1708.0 / safe)
    sin_t = jnp.maximum(jnp.sin(1.8 * gamma), 0.0)
    b = 1.0 - 1708.0 * sin_t**1.6 / safe
    c = (safe / 5830.0) ** (1.0 / 3.0) - 1.0
    return 1.0 + 1.44 * a * b + _relu(c)


def _nu_60(ra, a_gi):
    """Nusselt at 60 deg (ISO 15099 Eq. 45-48; gas.rs:249-263)."""
    g = 0.5 / (1.0 + (ra / 3160.0) ** 20.6) ** 0.1
    nu1 = (1.0 + (0.0936 * ra**0.314 / (1.0 + g)) ** 7) ** (1.0 / 7.0)
    nu2 = (0.104 + 0.175 / a_gi) * ra**0.283
    return jnp.maximum(nu1, nu2)


def _nu_90(ra, a_gi):
    """Nusselt at 90 deg (ISO 15099 Eq. 49-53; gas.rs:285-307)."""
    nu1_low = 1.0 + 1.7596678e-10 * ra**2.2984755  # Eq. 52, ra <= 1e4
    nu1_mid = 0.028154 * ra**0.4134  # Eq. 51, 1e4 < ra < 5e4
    nu1_high = 0.0673838 * ra ** (1.0 / 3.0)  # Eq. 50, ra >= 5e4
    nu1 = jnp.where(ra <= 1e4, nu1_low, jnp.where(ra < 5e4, nu1_mid, nu1_high))
    nu2 = 0.242 * (ra / a_gi) ** 0.272  # Eq. 53
    return jnp.maximum(nu1, nu2)


def _nu_60_90(ra, gamma, a_gi):
    """Linear interpolation between 60 and 90 deg (gas.rs:269-280)."""
    nu60 = _nu_60(ra, a_gi)
    nu90 = _nu_90(ra, a_gi)
    x = (gamma - PI / 3.0) / (PI / 2.0 - PI / 3.0)
    return nu60 + (nu90 - nu60) * x


def _nu_90_180(ra, a_gi, gamma):
    """Nusselt for tilt 90..180 deg (ISO 15099 Eq. 54; gas.rs:312-315)."""
    nu_v = _nu_90(ra, a_gi)
    return 1.0 + (nu_v - 1.0) * jnp.sin(gamma)


def nusselt(ra, gamma, a_gi):
    """Cavity Nusselt number, branch-free (gas.rs:197-221).

    ``gamma`` is the cavity tilt in radians (0 horizontal, pi/2 vertical);
    reduced modulo pi exactly like the reference.
    """
    thirty = 30.0 * PI / 180.0
    eps = 0.5 * PI / 180.0
    gamma = jnp.asarray(gamma) % PI

    n_0_60 = _nu_0_60(ra, gamma, a_gi)
    n_60 = _nu_60(ra, a_gi)
    n_60_90 = _nu_60_90(ra, gamma, a_gi)
    n_90 = _nu_90(ra, a_gi)
    n_90_180 = _nu_90_180(ra, a_gi, gamma)

    out = n_90_180
    out = jnp.where(gamma < 3.0 * thirty + eps, n_90, out)
    out = jnp.where(gamma < 3.0 * thirty - eps, n_60_90, out)
    out = jnp.where(gamma < 2.0 * thirty + eps, n_60, out)
    out = jnp.where(gamma < 2.0 * thirty - eps, n_0_60, out)
    return out


def cavity_convection(gas: GasProps, height, thickness, gamma, t_front_c, t_back_c):
    """Convective coefficient h of a gas cavity (ISO 15099 5.3.3.1; gas.rs:126-152).

    Handles the ``180 - gamma`` complement automatically when the cavity is
    heated from the front (t_front > t_back), like the reference.
    """
    gamma = jnp.where(t_front_c > t_back_c, PI - gamma, gamma)
    # Padded layouts carry zero-thickness cavity lanes whose h is masked out
    # downstream; guard the divides so they don't emit inf (and the
    # RuntimeWarning noise that comes with it on the CPU eager path).
    safe_thickness = jnp.where(thickness > 0.0, thickness, 1.0)
    a_gi = height / safe_thickness
    ra = rayleigh(gas, t_front_c, t_back_c, thickness)
    nu = nusselt(ra, gamma, a_gi)
    temp = (t_front_c + t_back_c) / 2.0 + KELVIN
    lam = thermal_conductivity(gas, temp)
    # Eq. 39 of ISO15099/2003
    return nu * lam / safe_thickness
