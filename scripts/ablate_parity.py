"""Ablation harness for the parity day kernel (PERF.md's methodology,
made reproducible): monkeypatch one component out of the sub-step physics
BEFORE the kernel is traced, march --days at full bench scale, and report
wall-clock.  Differences vs --ablate none attribute kernel time to
components (surface.rs:596-1001 physics equivalents).

Run on the TPU (one variant per process so each traces a fresh kernel):

    for a in none rk4 tarp cbrt nomass q pairs; do
        python scripts/ablate_parity.py --ablate $a
    done

Notes: wall-clock deltas at 30 days carry ~2-3 % run-to-run noise through
the remote tunnel; the scan-wrapped harness carries a few percent fixed
overhead vs bench.py's annual number (PERF.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


ABLATIONS = {
    "parity": ("none", "rk4", "tarp", "cbrt", "cbrt_fast", "nomass", "q",
               "pairs"),
    "trbdf2": ("none", "solves", "matvec", "tarp"),
    # refresh re-runs TARP + K assembly + the two stage factorizations every
    # sub-step; `factor` isolates the PCR elimination chains (the solves keep
    # running against trivial coefficients), `tarp`/`cbrt` the film physics.
    "trbdf2_refresh": ("none", "solves", "matvec", "tarp", "cbrt", "factor"),
}


def apply_ablation(name: str, mode: str):
    import jax.numpy as jnp

    from heatx.engine import surface as surf_mod
    from heatx.ops import tridiag
    from heatx.physics import convection

    if name not in ABLATIONS[mode]:
        raise SystemExit(
            f"ablation {name!r} is not meaningful in mode {mode!r} "
            f"(allowed: {', '.join(ABLATIONS[mode])}) — a mismatched patch "
            "would silently misattribute kernel time"
        )

    def patch_tarp(fn):
        # surface.py binds the function by name at import time — patch both
        # the convection module attribute and the bound name in surface.
        convection.tarp_natural_convection_coefficient = fn
        surf_mod.tarp_natural_convection_coefficient = fn

    def tarp_with_cbrt(cbrt_fn):
        # Swap only the cube-root evaluation; the branch select + MIN_H
        # floor stay the real implementation (convection.tarp_natural_from_cbrt).
        def h(air_t, surf_t, cos_tilt, mosaic_compat=False, coeffs=None):
            delta_t = air_t - surf_t
            abs_dt = jnp.abs(delta_t)
            abs_cos = jnp.abs(cos_tilt)
            return convection.tarp_natural_from_cbrt(
                delta_t, abs_dt, abs_cos, cos_tilt, cbrt_fn(abs_dt), coeffs
            )

        patch_tarp(h)

    if name == "none":
        return
    if name == "rk4":
        # Remove the massive march's 4 tridiag mat-vecs + stage combine.
        surf_mod.rk4_apply = lambda lower, diag, upper, q, T, flush_tiny=True: T
    elif name == "tarp":
        # Natural h -> constant (both the in-march and post-march evals).
        def const_h(air_t, surf_t, cos_tilt, mosaic_compat=False, coeffs=None):
            return jnp.full_like(air_t + surf_t, 3.0)

        patch_tarp(const_h)
    elif name == "cbrt":
        # Keep the TARP branch selects/multiplies, remove only the cube
        # root itself (-> identity): isolates the transcendental's cost.
        tarp_with_cbrt(lambda abs_dt: abs_dt)
    elif name == "cbrt_fast":
        # Candidate replacement (not an ablation): cube root via a sqrt-chain
        # initial guess x^(21/64) refined by two Newton steps — only
        # hardware-cheap ops (sqrt, mul, div) instead of the pow's exp/log.
        # Measured 38% SLOWER than Mosaic's pow lowering (PERF.md).
        def sqrt_chain_cbrt(abs_dt):
            x = jnp.maximum(abs_dt, 1e-30)
            s2 = jnp.sqrt(jnp.sqrt(x))        # x^(1/4)
            s4 = jnp.sqrt(jnp.sqrt(s2))       # x^(1/16)
            s6 = jnp.sqrt(jnp.sqrt(s4))       # x^(1/64)
            y = s2 * s4 * s6                  # x^(21/64) ~ x^0.328
            y = (2.0 / 3.0) * y + (1.0 / 3.0) * x / (y * y)
            y = (2.0 / 3.0) * y + (1.0 / 3.0) * x / (y * y)
            return y

        tarp_with_cbrt(sqrt_chain_cbrt)
    elif name == "nomass":
        def skip(sb, T0, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, config,
                 K=None, solver=None, statics=None):
            return T0

        surf_mod.march_nomass = skip
    elif name == "q":
        def solar_only(sb, T, U, env_f, env_b, rad_hs_f, rad_hs_b, solar_q,
                       statics=None):
            return solar_q + 0.0 * T

        surf_mod.assemble_q = solar_only
    elif name == "pairs":
        # Pair solve -> plain division (drop the 2x2 Cramer couplings).
        tridiag.solve_runs2 = (
            lambda lower, diag, upper, rhs, pair_head, pair_tail: rhs / diag
        )
    elif name == "solves":
        # (trbdf2) the two pre-factored stage solves -> identity.
        tridiag.pcr_apply = lambda lv, invb, rhs: rhs
        tridiag.solve_factored = lambda lower, cs, inv, rhs: rhs
    elif name == "matvec":
        # (trbdf2) the K mat-vec in the stage-1 rhs -> diagonal only.
        tridiag.matvec = lambda lower, diag, upper, x: diag * x
    elif name == "factor":
        # (trbdf2_refresh) remove the PCR elimination chains but keep the
        # apply sweeps running (zero alpha/gamma levels, reciprocal diag) so
        # Mosaic cannot dead-code the solves away with them.
        def zero_factor(lower, diag, upper):
            z = jnp.zeros_like(diag)
            levels = []
            d = 1
            while d < diag.shape[0]:
                levels.append((z, z))
                d *= 2
            return tuple(levels), 1.0 / diag

        tridiag.pcr_factor = zero_factor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--ablate", default="none",
        help="parity: none|rk4|tarp|cbrt|cbrt_fast|nomass|q|pairs; "
             "trbdf2: none|solves|matvec|tarp; "
             "trbdf2_refresh: none|solves|matvec|tarp|cbrt|factor",
    )
    ap.add_argument("--mode", default="parity",
                    choices=["parity", "trbdf2", "trbdf2_refresh"])
    ap.add_argument("--substeps", type=int, default=8,
                    help="sub-steps/hour in trbdf2 mode")
    ap.add_argument("--refresh-every", type=int, default=None,
                    help="trbdf2_refresh hybrid cadence (operators rebuild "
                         "every k sub-steps; default every sub-step)")
    ap.add_argument("--nomass-iters", type=int, default=1,
                    help="fixed no-mass iterations (0 = exact adaptive "
                         "while_loop, parity mode only)")
    ap.add_argument("--zones", type=int, default=1000)
    ap.add_argument("--surfaces-per-zone", type=int, default=10)
    ap.add_argument("--days", type=int, default=30)
    ap.add_argument("--block-size", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("HEATX_JAX_CACHE", "/tmp/heatx-jax-cache"),
    )

    import bench as bench_mod  # reuse the bench's model + weather builders
    import heatx
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod

    apply_ablation(args.ablate, args.mode)

    from heatx.ops import pallas_step
    from heatx.weather.epw import interpolate_to_steps

    dtype = jnp.float32
    model = bench_mod.build_city_model(args.zones, args.surfaces_per_zone)
    cfg = heatx.SimConfig(
        dtype=dtype,
        nomass_fixed_iters=args.nomass_iters if args.nomass_iters > 0 else None,
    )
    building = compile_building(model, n=1, config=cfg)
    n_nodes_total = int(np.sum(building.surfaces.n_nodes))
    subs = (building.dt_subdivisions if args.mode == "parity"
            else args.substeps)
    H = 24
    span = args.days * H
    dry, wind, wdir, ghi, ir = bench_mod.load_weather(span)

    bb = pallas_step.block_building(building, block_size=args.block_size)
    hm, params = pallas_step.make_hour_march(
        bb, substeps=(None if args.mode == "parity" else args.substeps),
        mode=args.mode, hours=H,
        refresh_every=(args.refresh_every
                       if args.mode == "trbdf2_refresh" else None),
    )
    lay = bb.layout
    SP = lay.padded_surfaces
    rng = np.random.default_rng(0)
    sol_factor_b = jnp.asarray(
        lay.surfaces_to_blocked(rng.uniform(0.2, 1.0, building.n_surfaces)),
        dtype,
    )
    a_gain = np.zeros(building.n_zones)
    np.add.at(a_gain, np.asarray(building.hvac_pair_space), 500.0)
    np.add.at(a_gain, np.asarray(building.lum_space), 150.0)
    ag_day = jnp.broadcast_to(
        jnp.asarray(lay.zones_to_blocked(a_gain), dtype)[None],
        (H, bb.n_blocks, bb.zones_per_block),
    )
    az_day = jnp.zeros((H, bb.n_blocks, bb.zones_per_block), dtype)
    zeros_hsp = jnp.zeros((H, SP), dtype)
    state0 = state_mod.initial_state(building)
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(state0.node_T)), dtype)
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(state0.zone_T)), dtype)

    def per_substep(v):
        return jnp.asarray(
            interpolate_to_steps(np.asarray(v, np.float64), subs)
            .reshape(args.days, H * subs), dtype)

    def per_hour(v):
        return jnp.asarray(np.asarray(v, np.float64).reshape(args.days, H),
                           dtype)

    W = tuple(per_substep(v) for v in (dry, wind, wdir)) + tuple(
        per_hour(v) for v in (ghi, ir))

    @jax.jit
    def run_days(params, T, zT, xs):
        def body(carry, day):
            T, zT = carry
            d_t, d_w, d_d, d_g, d_i = day
            hi = (d_t, d_w, d_d,
                  d_g[:, None] * sol_factor_b[None, :], zeros_hsp,
                  jnp.broadcast_to(d_i[:, None], (H, SP)), zeros_hsp,
                  ag_day, az_day)
            T, zT, _, _ = hm(params, T, zT, hi)
            return (T, zT), None

        (T, zT), _ = jax.lax.scan(body, (T, zT), xs)
        return T, zT

    t0 = time.time()
    T1, zT1 = run_days(params, T0, zT0, W)
    float(zT1[0, 0])  # force completion (block_until_ready unreliable here)
    compile_s = time.time() - t0

    t0 = time.time()
    T2, zT2 = run_days(params, T1, zT1, W)
    zone0 = float(zT2[0, 0])
    wall = time.time() - t0

    annual_equiv = wall * 365.0 / args.days
    print(json.dumps({
        "ablate": args.ablate, "days": args.days, "wall_s": round(wall, 3),
        "annual_equiv_s": round(annual_equiv, 2), "compile_s": round(compile_s, 1),
        "substeps_per_hour": subs,
        "node_updates_per_sec": round(n_nodes_total * span * subs / wall),
        "zone0": round(zone0, 3), "finite": bool(np.isfinite(zone0)),
    }))


if __name__ == "__main__":
    main()
