"""EnergyPlus cross-validation replay (the serious suite).

Mirrors tests/validate_wall_heat_transfer.rs:817-994 + tilted + horizontal:
replay each fixture's boundary conditions through the compiled wall+zone
solver and compare zone temperatures after the 5000-step warm-up.

Measured heatx agreement (float64, matching the reference scheme), as
ABSOLUTE zone-temperature error — the fractional thresholds below divide by
each case's zone-T range, which varies 2-26 K across cases:

| case                      | rmse K | bias K | range K | % of range |
|---------------------------|--------|--------|---------|------------|
| massive_full              | 0.062  | -0.004 |  9.3    | 0.7        |
| massive_no_ir_no_solar    | ~0.02  |  ~0    |  8.9    | <1         |
| massive_no_ir_yes_solar   | 0.065  | -0.012 |  9.2    | 0.7        |
| massive_yes_ir_no_solar   | ~0.03  |  ~0    |  9.0    | <1         |
| mixed_full                | 0.042  | -0.037 |  2.3    | 1.8        |
| mixed_no_ir_no_solar      | 0.018  | +0.012 |  2.2    | 0.8        |
| mixed_no_ir_yes_solar     | 0.168  | -0.131 |  3.0    | 5.7        |
| mixed_yes_ir_no_solar     | 0.066  | +0.047 |  2.1    | 3.2        |
| nomass_no_ir_yes_solar    | 0.223  | +0.008 | 25.7    | 0.9        |
| (remaining cases)         | <0.1   | small  | 8-26    | <2         |

The elevated thresholds on the mixed_* cases are a COLD-START ARTIFACT of
the reference's replay protocol, not solver error — proven by two
experiments (round 3):

1. **Pinned-h replay** (refutes the round-2 film-equilibrium hypothesis):
   driving the inside and/or outside film coefficient from EnergyPlus's own
   logged per-step h series (run_case(..., pin_h_inside/outside=True))
   leaves mixed_no_ir_yes_solar's bias unchanged (-0.131 K -> -0.133 K
   pinned inside, -0.142 K both pinned).  The films are not the cause.
2. **Warm-start replay** (identifies the real cause): the protocol
   initializes wall nodes at 22 C and skips 5000 steps (10.4 days), but
   EnergyPlus enters January after 25 warm-up days.  The insulated mixed
   wall is the one construction whose zone+wall time constant
   (C/(UA) ~ 6.6 days) outlives the skip, so the decaying initial-state
   transient reads as "bias": measured -0.214 K over the first half of the
   scored window vs -0.047 K over the second.  Replaying the 21-day series
   twice (run_case(..., passes=2) — a converged initial state) collapses
   every mixed case BELOW the standard 2% threshold:
   mixed_no_ir_yes_solar 0.0569 -> 0.0134 rmse/range,
   mixed_yes_ir_no_solar 0.0322 -> 0.0045, mixed_full 0.0181 -> 0.0068.
   Gated by test_mixed_bias_is_cold_start_artifact below.

The single-pass thresholds therefore stay at the reference protocol's
values (the transient is part of that protocol and the reference's own runs
share the 22 C initialization, surface_trait.rs:356-378); the warm-start
test pins the solver itself to the standard 2%.

The reference's own error levels cannot be measured in this environment
(its Rust toolchain and `validate` crate are unavailable and there is no
network egress); heatx's parity path — every physics component of which is
pinned to the reference's published unit-test values — stands in for it.
"""

import numpy as np
import pytest

from heatx.validate.replay import WALL_CASES, run_case
from heatx.validate.series import SeriesValidation

# (rmse_frac, bias_frac) per case.
THRESHOLDS = {
    "massive_full": (0.02, 0.01),
    "massive_no_ir_no_solar": (0.02, 0.01),
    "massive_no_ir_yes_solar": (0.02, 0.01),
    "massive_yes_ir_no_solar": (0.02, 0.01),
    "mixed_full": (0.03, 0.025),
    "mixed_no_ir_no_solar": (0.02, 0.01),
    "mixed_no_ir_yes_solar": (0.07, 0.06),
    "mixed_yes_ir_no_solar": (0.045, 0.03),
    "nomass_full": (0.02, 0.01),
    "nomass_no_ir_no_solar": (0.02, 0.01),
    "nomass_no_ir_yes_solar": (0.02, 0.01),
    "nomass_yes_ir_no_solar": (0.02, 0.01),
    "tilted": (0.02, 0.01),
    "horizontal": (0.02, 0.01),
}


# The parity suite runs TWICE: once with the reference-exact adaptive
# while_loop (nomass_iters=None) and once with nomass_fixed_iters=1 — the
# regime the fused parity Pallas kernel (and the bench's parity row) actually
# executes.  Measured (f64): the fixed-1 regime moves every case by < 0.2% of
# range vs the exact loop (worst: nomass_no_ir_yes_solar 0.0087 -> 0.0100
# rmse/range) and passes the same thresholds, so the 8 s parity-kernel bench
# row carries the same evidence as the exact loop.  Reference standard:
# validate_wall_heat_transfer.rs:615-711.
@pytest.mark.slow
@pytest.mark.parametrize("nomass_iters", [None, 1], ids=["exact-loop", "fixed1"])
@pytest.mark.parametrize("name", sorted(WALL_CASES), ids=sorted(WALL_CASES))
def test_eplus_replay(name, nomass_iters, ref_fixtures):
    case = WALL_CASES[name]
    expected, found = run_case(case, ref_fixtures, nomass_fixed_iters=nomass_iters)
    rmse_frac, bias_frac = THRESHOLDS[name]
    v = SeriesValidation(
        title=name if nomass_iters is None else f"{name} (nomass_fixed_iters=1)",
        expected=expected,
        found=found,
        expected_legend="EnergyPlus",
        y_label="Zone Temperature",
        y_units="C",
        max_rmse_frac=rmse_frac,
        max_bias_frac=bias_frac,
    )
    m = v.metrics()
    assert v.passes(), f"{name} (nomass_iters={nomass_iters}): {m}"


@pytest.mark.slow
@pytest.mark.parametrize(
    "name, max_rmse_frac, max_bias_K",
    [
        ("mixed_no_ir_yes_solar", 0.02, 0.05),
        ("mixed_yes_ir_no_solar", 0.02, 0.05),
        ("mixed_full", 0.02, 0.05),
    ],
)
def test_mixed_bias_is_cold_start_artifact(name, max_rmse_frac, max_bias_K, ref_fixtures):
    """With a converged initial state (two back-to-back passes over the
    fixture series, scoring the second), every mixed case meets the STANDARD
    2%-of-range threshold — the single-pass excess is the decaying 22 C
    initialization transient, not solver error (see module docstring)."""
    expected, found = run_case(WALL_CASES[name], ref_fixtures, passes=2)
    d = found - expected
    rng = expected.max() - expected.min()
    rmse_frac = float(np.sqrt((d ** 2).mean()) / rng)
    bias = float(d.mean())
    assert rmse_frac < max_rmse_frac, f"{name}: rmse/range {rmse_frac:.4f}"
    assert abs(bias) < max_bias_K, f"{name}: bias {bias:+.4f} K"


@pytest.mark.slow
def test_pinned_h_replay_runs_in_band(ref_fixtures):
    """The pinned-h diagnostic harness (per-step film coefficients driven
    from the EnergyPlus logs) stays in the same error band as the TARP
    evaluation — guarding both the harness wiring and the conclusion that
    film differences are not the mixed-case error source."""
    name = "mixed_no_ir_yes_solar"
    expected, found = run_case(
        WALL_CASES[name], ref_fixtures, pin_h_inside=True, pin_h_outside=True
    )
    d = found - expected
    rng = expected.max() - expected.min()
    rmse_frac = float(np.sqrt((d ** 2).mean()) / rng)
    # Same band as the unpinned threshold: pinning h must not blow up (it
    # measured 0.0617 vs 0.0569 unpinned; the cold-start transient dominates
    # both).
    assert rmse_frac < THRESHOLDS[name][0], f"{name} pinned-h: {rmse_frac:.4f}"


# The TR-BDF2 fast mode replayed against the same EnergyPlus evidence: at the
# fixtures' 3-minute main steps the mode's only approximations are the
# per-main-step coefficient freeze and the 2x 90 s TR-BDF2 sub-steps.
# Measured (f64): within +-6% relative of the parity path's error on every
# case, and BETTER on the two hardest (mixed_full 0.0163 vs 0.0181 rmse/range,
# mixed_no_ir_yes_solar 0.0557 vs 0.0569) — the exact coupled no-mass solve
# beats the reference's relaxed fixed point there.  The parity thresholds
# therefore apply nearly unchanged (1.1x headroom for the small cases where
# the freeze costs a few %).
FAST_THRESHOLDS = {
    name: (r * 1.1, b * 1.1) for name, (r, b) in THRESHOLDS.items()
}


@pytest.mark.slow
@pytest.mark.parametrize(
    "refresh", [False, True], ids=["frozen-h", "refresh-h"]
)
@pytest.mark.parametrize("name", sorted(WALL_CASES), ids=sorted(WALL_CASES))
def test_eplus_replay_fast_mode(name, refresh, ref_fixtures):
    from heatx.engine.implicit import imp_march

    case = WALL_CASES[name]
    expected, found = run_case(
        case,
        ref_fixtures,
        march_fn=lambda b, s, i: imp_march(
            b, s, i, substeps=2, refresh_h=refresh
        ),
    )
    rmse_frac, bias_frac = FAST_THRESHOLDS[name]
    v = SeriesValidation(
        title=f"{name} (fast mode{', refresh-h' if refresh else ''})",
        expected=expected,
        found=found,
        expected_legend="EnergyPlus",
        y_label="Zone Temperature",
        y_units="C",
        max_rmse_frac=rmse_frac,
        max_bias_frac=bias_frac,
    )
    m = v.metrics()
    assert v.passes(), f"{name} fast mode (refresh={refresh}): {m}"
