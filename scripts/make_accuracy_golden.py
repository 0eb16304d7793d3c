"""Regenerate the committed golden for bench.py's hardware-accuracy row.

The golden is the REFERENCE-EXACT zone-temperature history (f64, CPU, the
adaptive no-mass while_loop, stability-dictated sub-steps, per-sub-step
interpolated EPW weather — the same parity integrator the EnergyPlus replay
suite gates) over 3 weeks of real weather on the 4-zone/40-surface city
model, produced by tests/test_fast_regime.compute_regime_runs.

bench.py replays the identical workload through the fused Pallas kernels on
the real TPU in float32 and reports the RMSE against this golden in the
scored JSON line (accuracy_* fields) — a hardware-measured accuracy number
to go with the wall-clock ones.

Run after any engine/numerics change that legitimately moves results:

    python scripts/make_accuracy_golden.py

(tests/test_fast_regime.py::test_committed_golden_matches_parity_run fails
until the golden is regenerated, so drift cannot go unnoticed.)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/heatx-jax-cache")

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "accuracy_golden_504h.npz")


def main():
    import test_fast_regime as tfr

    root = os.environ.get("HEAT_REF_FIXTURES", "/root/reference/tests")
    zhist_par, _, _ = tfr.compute_regime_runs(root)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(
        OUT,
        zhist_par=np.asarray(zhist_par, np.float64),
        hours=np.int64(tfr.HOURS),
        warmup=np.int64(tfr.WARMUP),
        zones=np.int64(4),
        surfaces_per_zone=np.int64(10),
    )
    print(f"wrote {os.path.normpath(OUT)}: zhist_par {zhist_par.shape}, "
          f"range [{zhist_par.min():.2f}, {zhist_par.max():.2f}] C")


if __name__ == "__main__":
    main()
