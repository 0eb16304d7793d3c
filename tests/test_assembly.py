"""K/q assembly and RK4 integrator tests.

The assembly test re-implements the reference's per-chunk dense get_k_q
algorithm (discretization.rs:596-700) directly from its documented rules in
plain numpy and checks that heatx's masked batched assembly produces exactly
the same tridiagonal systems for every chunk of a mixed (no-mass / massive /
no-mass) wall.  The RK4 test marches an exact 2x2 linear ODE
(surface.rs:1558-1620) to 1e-8.
"""

import numpy as np
import jax.numpy as jnp

import heatx
from heatx import (
    Boundary,
    BuildingModel,
    Construction,
    Material,
    SpaceDef,
    Substance,
    SurfaceDef,
    ThermalModel,
)
from heatx.engine import surface as surf
from heatx.engine.state import initial_state


def dense_ref_k_q(u_segments, temps, ini, fin, front, back, solar):
    """Dense per-chunk assembly following discretization.rs:596-700.

    ``front``/``back`` are dicts with air, rad, h, rad_hs.  ``u_segments[i]``
    couples node i to i+1 (already evaluated at the current temps).
    """
    nn = fin - ini
    K = np.zeros((nn, nn))
    q = np.zeros(nn)
    n_nodes = len(temps)

    for local_i in range(nn - 1):
        gi = ini + local_i
        u = u_segments[gi]
        K[local_i, local_i] -= u
        K[local_i + 1, local_i + 1] -= u
        K[local_i, local_i + 1] += u
        K[local_i + 1, local_i] += u

    if ini == 0:
        ts = temps[0]
        q[0] += front["air"] * front["h"] + front["rad_hs"] * (front["rad"] - ts)
        K[0, 0] -= front["h"]
    else:
        u = u_segments[ini - 1]
        q[0] += u * temps[ini - 1]
        K[0, 0] -= u

    if fin == n_nodes:
        ts = temps[fin - 1]
        q[nn - 1] += back["air"] * back["h"] + back["rad_hs"] * (back["rad"] - ts)
        K[nn - 1, nn - 1] -= back["h"]
    else:
        u = u_segments[fin - 1]
        q[nn - 1] += u * temps[fin]
        K[nn - 1, nn - 1] -= u

    q += solar[ini:fin]
    return K, q


def mixed_wall_model():
    m = BuildingModel()
    m.add_substance(
        Substance("poly", thermal_conductivity=0.0252, density=17.5,
                  specific_heat_capacity=2400.0,
                  front_thermal_absorbtance=0.9, back_thermal_absorbtance=0.9,
                  front_solar_absorbtance=0.7, back_solar_absorbtance=0.7)
    )
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0,
                  front_thermal_absorbtance=0.9, back_thermal_absorbtance=0.9,
                  front_solar_absorbtance=0.7, back_solar_absorbtance=0.7)
    )
    m.add_material(Material("p2", "poly", 0.02))
    m.add_material(Material("c20", "concrete", 0.2))
    m.add_construction(Construction("mixed", ["p2", "c20", "p2"]))
    m.add_space(SpaceDef("zone", 600.0))
    m.add_surface(
        SurfaceDef(
            "wall", "mixed", Boundary.outdoor(), Boundary.space_("zone"),
            vertices=np.array([[0, 0, 0], [20, 0, 0], [20, 0, 3], [0, 0, 3]], float),
        )
    )
    return m


def test_assembly_matches_dense_reference():
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = ThermalModel(mixed_wall_model(), n=20, config=cfg)
    sb = tm.building.surfaces

    # mixed wall: nomass(front poly) + massive(concrete) + nomass(back poly)
    mass_chunks, nomass_chunks = tm.building.discretizations[0].get_chunks()
    assert len(nomass_chunks) == 2 and len(mass_chunks) == 1

    nn = int(sb.n_nodes[0])
    rng = np.random.default_rng(0)
    # node-major [N, S=1]
    T = np.zeros_like(np.asarray(sb.mass))
    T[:nn, 0] = 20.0 + rng.uniform(-5, 5, nn)

    env_f = surf.FaceEnv(
        air=jnp.array([30.0]), rad=jnp.array([25.0]),
        surf=jnp.array([T[0, 0]]), h=jnp.array([7.3]),
    )
    env_b = surf.FaceEnv(
        air=jnp.array([21.0]), rad=jnp.array([21.0]),
        surf=jnp.array([T[nn - 1, 0]]), h=jnp.array([2.1]),
    )
    rad_hs_f = jnp.array([4.4])
    rad_hs_b = jnp.array([3.3])
    solar = rng.uniform(0, 50, T.shape) * np.asarray(sb.node_mask)

    U = np.asarray(surf.segment_u(sb, jnp.asarray(T), env_b.air))
    lower, diag, upper, q = (
        np.asarray(x)
        for x in surf.assemble_k_q(
            sb, jnp.asarray(T), jnp.asarray(U), env_f, env_b, rad_hs_f, rad_hs_b,
            jnp.asarray(solar),
        )
    )

    front = {"air": 30.0, "rad": 25.0, "h": 7.3, "rad_hs": 4.4}
    back = {"air": 21.0, "rad": 21.0, "h": 2.1, "rad_hs": 3.3}

    for ini, fin in nomass_chunks + mass_chunks:
        K_ref, q_ref = dense_ref_k_q(
            U[:, 0], T[:nn, 0], ini, fin, front, back, solar[:, 0]
        )
        for li, gi in enumerate(range(ini, fin)):
            np.testing.assert_allclose(diag[gi, 0], K_ref[li, li], rtol=1e-14)
            np.testing.assert_allclose(q[gi, 0], q_ref[li], rtol=1e-13)
            if li > 0:
                np.testing.assert_allclose(lower[gi, 0], K_ref[li, li - 1], rtol=1e-14)
            if li + 1 < fin - ini:
                np.testing.assert_allclose(upper[gi, 0], K_ref[li, li + 1], rtol=1e-14)
        # couplings across the chunk boundary must be absent from the matrix
        if ini > 0:
            assert lower[ini, 0] == 0.0
        if fin < nn:
            assert upper[fin - 1, 0] == 0.0


def test_rk4_exact_ode():
    """rk4 vs the exact solution of dT = K T with K = [[1,-3],[4,-6]]
    (surface.rs:1558-1620): T_a = 0.75 e^-3t + e^-2t, T_b = e^-3t + e^-2t,
    to 1e-8 over t in [0, 100]."""
    import jax

    dt = 0.01
    n_steps = 10000
    # node-major [N=2, S=1]
    lower = jnp.array([[0.0], [4.0]]) * dt
    diag = jnp.array([[1.0], [-6.0]]) * dt
    upper = jnp.array([[-3.0], [0.0]]) * dt
    q = jnp.zeros((2, 1))

    @jax.jit
    def rollout(T0):
        def body(T, _):
            T_new = surf.rk4_apply(lower, diag, upper, q, T)
            return T_new, T
        _, hist = jax.lax.scan(body, T0, None, length=n_steps + 1)
        return hist  # [n_steps+1, 2, 1]

    hist = np.asarray(rollout(jnp.array([[1.75], [2.0]])))[:, :, 0]
    t = np.arange(n_steps + 1) * dt
    exp_a = 0.75 * np.exp(-3 * t) + np.exp(-2 * t)
    exp_b = np.exp(-3 * t) + np.exp(-2 * t)
    assert np.max(np.abs(hist[:, 0] - exp_a)) < 1e-8
    assert np.max(np.abs(hist[:, 1] - exp_b)) < 1e-8
