"""ISO 9050 glazing identities (glazing.rs:289-524), to 1e-15."""

import numpy as np

from heatx.physics.glazing import Glazing, alphas, combine_layers


def test_9050_identities():
    tau1, rho_b1, rho_f1 = 0.1, 0.3, 0.13
    g1 = Glazing(tau1, rho_f1, rho_b1)
    tau2, rho_b2, rho_f2 = 0.21, 0.34, 0.1123
    g2 = Glazing(tau2, rho_f2, rho_b2)

    # Eq. 2
    assert abs(g1.combined_tau(g2) - tau1 * tau2 / (1 - rho_b1 * rho_f2)) < 1e-15
    # Eq. 5
    exp = rho_f1 + tau1 * tau1 * rho_f2 / (1 - rho_b1 * rho_f2)
    assert abs(g1.combined_rho_front(g2) - exp) < 1e-15

    tau3, rho_b3, rho_f3 = 0.21, 0.34, 0.1123
    g3 = Glazing(tau3, rho_f3, rho_b3)
    g13 = g1.combine(g2).combine(g3)

    # Eq. 3
    exp = (
        tau1
        * tau2
        * tau3
        / ((1 - rho_b1 * rho_f2) * (1 - rho_b2 * rho_f3) - tau2**2 * rho_b1 * rho_f3)
    )
    assert abs(exp - g13.tau) < 1e-15

    # Eq. 6
    exp = rho_f1 + (
        tau1 * tau1 * rho_f2 * (1 - rho_b2 * rho_f3) + tau1 * tau1 * tau2 * tau2 * rho_f3
    ) / ((1 - rho_b1 * rho_f2) * (1 - rho_b2 * rho_f3) - tau2 * tau2 * rho_b1 * rho_f3)
    assert abs(exp - g13.rho_front) < 1e-15

    # combine_layers equivalence
    other = combine_layers([g1, g2, g3])
    for attr in ("tau", "rho_front", "rho_back", "alpha_front", "alpha_back"):
        assert abs(getattr(g13, attr) - getattr(other, attr)) < 1e-15

    # Alphas sum to the combined front absorbtance
    a = alphas([g1, g2, g3])
    assert abs(sum(a) - g13.alpha_front) < 1e-15

    # Eq. 23-25
    a_f1, a_b1 = g1.alpha_front, g1.alpha_back
    a_f2, a_b2 = g2.alpha_front, g2.alpha_back
    a_f3 = g3.alpha_front
    denom = (1 - rho_b1 * rho_f2) * (1 - rho_b2 * rho_f3) - tau2 * tau2 * rho_b1 * rho_f3
    exp_a1 = a_f1 + (
        tau1 * a_b1 * rho_f2 * (1 - rho_b2 * rho_f3) + tau1 * tau2 * tau2 * a_b1 * rho_f3
    ) / denom
    exp_a2 = (tau1 * a_f2 * (1 - rho_b2 * rho_f3) + tau1 * tau2 * a_b2 * rho_f3) / denom
    exp_a3 = (tau1 * tau2 * a_f3) / denom
    np.testing.assert_allclose(a, [exp_a1, exp_a2, exp_a3], atol=1e-15)


def test_single_layer_alpha():
    g = Glazing(0.0, 0.9, 0.8)
    assert alphas([g]) == [g.alpha_front]
    assert abs(g.alpha_front - 0.1) < 1e-15
