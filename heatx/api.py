"""High-level API: the heatx equivalent of the reference's host-protocol layer.

The reference plugs into SIMPLE's orchestrator through the ``SimulationModel``
trait — ``new`` / ``allocate_memory`` / ``march`` (model.rs:188-428).  heatx
exposes the same three-phase contract, JAX-style:

* :class:`ThermalModel` construction = compile the building to padded arrays
  (``ThermalModel::new``);
* :meth:`ThermalModel.initial_state` = allocate the state carry
  (``allocate_memory`` + the state-header registration);
* :meth:`ThermalModel.march` = advance one main timestep (jit-compiled);
  :meth:`ThermalModel.run` scans a whole input sequence in one XLA call.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax

from heatx.config import DEFAULT_CONFIG, SimConfig
from heatx.build.layout import CompiledBuilding, compile_building
from heatx.engine import step as step_mod
from heatx.engine.state import SimState, StepInputs, default_inputs, initial_state
from heatx.model.building import BuildingModel

#: FastRunner.run defers the per-chunk finiteness sync to one end-of-run
#: reduction when a dispatch chunk covers fewer surface-hours than this
#: (the per-chunk host round trip costs more than it protects at small
#: scale; large runs keep the lagged per-chunk fail-fast check).
DEFER_CHECK_SURFACE_HOURS = int(1e7)


class ThermalModel:
    """A compiled, jit-ready whole-building thermal model."""

    def __init__(
        self,
        model: BuildingModel,
        n: int = 1,
        config: SimConfig = DEFAULT_CONFIG,
    ):
        self.building: CompiledBuilding = compile_building(model, n=n, config=config)
        self._march = None
        self._run = {}  # keyed by collect_zone_T
        self._zone_mrt_fn = None
        self._run_checked = {}
        self._march_exp = None
        self._march_imp = None
        self._device_building = None

    def _device(self) -> CompiledBuilding:
        """Dtype-cast building snapshot handed to jitted engine calls.
        Created lazily so host-side tweaks (set_fixed_h, emissivity edits)
        made before the first march are picked up; call ``invalidate()``
        after later edits."""
        if self._device_building is None:
            self._device_building = self.building.astype(self.building.config.dtype)
        return self._device_building

    def invalidate(self):
        self._device_building = None

    def set_ground_temperature(self, value: float) -> None:
        """Update every ground-contact face's soil temperature in place.

        Seasonal ground coupling: EPW files tabulate monthly soil
        temperatures (``EPWData.ground_temperature`` /
        ``heatx.weather.epw.monthly_to_hourly``); call this between run
        segments — the boundary temperatures are pytree leaves, so the next
        jitted call picks the new values up without recompiling (the
        mechanism the ``Boundary.ground`` docstring promises,
        heatx/model/building.py)."""
        import numpy as np

        from heatx.build.layout import B_GROUND

        sb = self.building.surfaces
        front = np.asarray(sb.front_code) == B_GROUND
        back = np.asarray(sb.back_code) == B_GROUND
        if not (front.any() or back.any()):
            raise ValueError("model has no ground boundaries")
        sb.front_temp[front] = value
        sb.back_temp[back] = value
        self.invalidate()

    # -- introspection -------------------------------------------------------

    @property
    def dt(self) -> float:
        return self.building.dt

    @property
    def dt_subdivisions(self) -> int:
        return self.building.dt_subdivisions

    @property
    def surfaces(self):
        return self.building.surfaces

    # -- state ---------------------------------------------------------------

    def initial_state(self, dtype=None) -> SimState:
        return initial_state(self.building, dtype=dtype)

    def inputs(self, dtype=None, **overrides) -> StepInputs:
        return default_inputs(self.building, dtype=dtype, **overrides)

    def inputs_sequence(self, T: int, dtype=None, **overrides) -> StepInputs:
        """A [T, ...] StepInputs sequence for :meth:`run`/:meth:`run_checked`.

        Each channel may be given static (its :meth:`inputs` shape — held
        constant and broadcast over the ``T`` main steps) or per-step (a
        leading axis of length ``T``, e.g. an hourly weather series).  The
        weather scalars (``t_out``/``wind_speed``/``wind_direction``) may
        additionally carry a trailing ``[dt_subdivisions]`` axis for
        sub-step-interpolated values ([T, sub] per-step, [sub] static).  A
        1-D weather array of length T is read as a per-step series.
        ``mix_vol``/``heat_sp``/``cool_sp``/``shade_sp`` keep their
        documented static-or-scheduled forms (the scan lifts them itself).
        """
        import jax.numpy as jnp

        base = default_inputs(self.building, dtype=dtype)
        weather = ("t_out", "wind_speed", "wind_direction")
        upd = {}
        for name in StepInputs._fields:
            if name in ("mix_vol", "heat_sp", "cool_sp", "shade_sp"):
                if overrides.get(name) is not None:
                    upd[name] = jnp.asarray(overrides[name])
                continue
            b0 = getattr(base, name)
            if overrides.get(name) is None:
                # Absent OR explicit None: keep the default (same contract
                # as default_inputs).
                upd[name] = jnp.broadcast_to(b0[None], (T,) + b0.shape)
                continue
            v = jnp.asarray(overrides[name], dtype=b0.dtype)
            if v.ndim >= 1 and v.shape[0] == T:
                # Per-step series; the remainder must be a valid static form.
                if name in weather and v.ndim <= 2:
                    upd[name] = v
                else:
                    # Per-step values broadcast against the static shape
                    # from the LEFT: a [T] series is one value per step
                    # held constant across the channel's elements (it was
                    # previously right-aligned, which read a [T] series as
                    # a static spatial map whenever T == len(b0)).
                    tail = v.shape[1:]
                    v2 = v.reshape((T,) + tail + (1,) * (b0.ndim - len(tail)))
                    upd[name] = jnp.broadcast_to(v2, (T,) + b0.shape)
            elif name in weather and v.ndim == 1:
                # [sub] static per-sub-step values.
                upd[name] = jnp.broadcast_to(v[None], (T,) + v.shape)
            else:
                v = jnp.broadcast_to(v, b0.shape)
                upd[name] = jnp.broadcast_to(v[None], (T,) + b0.shape)
        return base._replace(**upd)

    def warmup(
        self,
        state: SimState,
        inputs_period: StepInputs,
        max_repeats: int = 25,
        tol: float = 0.01,
        run=None,
    ):
        """EnergyPlus-style warm-up: repeat one period of inputs until the
        state converges period-over-period.

        Marches ``inputs_period`` (typically the horizon's first day, via
        :meth:`inputs_sequence`) repeatedly from ``state``, stopping when the
        largest zone- or node-temperature change between consecutive repeats
        drops below ``tol`` K, or after ``max_repeats`` (EnergyPlus's default
        cap is 25 warm-up days).  Returns ``(state, repeats_run)``.

        Why: simulations start from the registered 22 C initialization
        (surface_trait.rs:356-378); a massive or insulated envelope carries
        that transient for days (the replay analysis measured a ~6.6-day
        time constant for the mixed fixture wall — the dominant replay error
        source; tests/test_eplus_replay.py).  The reference has no warm-up
        mechanism; EnergyPlus repeats the first day until convergence, which
        is what this reproduces.

        ``run`` overrides the period integrator (``run(state) -> state``;
        default: :meth:`run` without history) — pass a FastRunner closure to
        warm up through the fused kernel.
        """
        import numpy as np

        if run is None:
            def run(s):
                return self.run(s, inputs_period, collect_zone_T=False)[0]

        mask = np.asarray(self.building.surfaces.node_mask)
        prev_z = prev_n = None
        for d in range(max_repeats):
            state = run(state)
            zt = np.asarray(state.zone_T)
            nt = np.where(mask, np.asarray(state.node_T), 0.0)
            if prev_z is not None:
                dz = float(np.max(np.abs(zt - prev_z))) if zt.size else 0.0
                dn = float(np.max(np.abs(nt - prev_n)))
                if max(dz, dn) < tol:
                    return state, d + 1
            prev_z, prev_n = zt, nt
        return state, max_repeats

    # -- marching ------------------------------------------------------------

    def march(self, state: SimState, inputs: StepInputs) -> SimState:
        """One main timestep (= dt_subdivisions sub-steps), jit-compiled.

        The building rides as a traced argument fetched per call, so
        host-side edits (``set_ground_temperature``, emissivity tweaks)
        followed by ``invalidate()`` take effect on the next march without
        recompiling."""
        _check_setpoint_order(self.building, inputs.heat_sp, inputs.cool_sp)
        if self._march is None:
            self._march = jax.jit(step_mod.march)
        return self._march(self._device(), state, inputs)

    def run(
        self,
        state: SimState,
        inputs_seq: StepInputs,
        collect_zone_T: bool = True,
        collect_loads: bool = False,
        collect_operative: bool = False,
        mode: str = "parity",
        substeps: Optional[int] = None,
        refresh_every: Optional[int] = None,
    ) -> Tuple[SimState, Optional[jax.Array]]:
        """March a whole [T, ...] input sequence in one compiled scan.

        With ``collect_loads`` (setpoint-driven HVAC only) the history
        output is ``(zone_T_hist, ideal_load_hist)`` — the per-main-step
        mean heating(+)/cooling(-) demand in W per zone.
        ``collect_operative`` appends the [T, Z] operative-temperature
        history ``(T_air + T_mrt)/2`` (see :meth:`zone_mrt`).

        ``mode`` selects the integrator for the whole scan: ``"parity"``
        (default, the reference's sub-step count), ``"trbdf2"`` /
        ``"trbdf2_refresh"`` / ``"exp"`` run the fast modes at ``substeps``
        sub-steps per main step (default 8, the bench regime) — the
        whole-sequence XLA-scan analogue of :meth:`march_imp` /
        :meth:`march_exp`, matching a host loop of those marches
        bit-for-bit."""
        _check_setpoint_order(
            self.building, inputs_seq.heat_sp, inputs_seq.cool_sp
        )
        if refresh_every is not None and mode != "trbdf2_refresh":
            raise ValueError("refresh_every applies to mode='trbdf2_refresh'")
        if mode == "parity":
            march_fn = None
            if substeps is not None:
                raise ValueError(
                    "substeps applies to the fast modes; the parity "
                    "integrator's sub-step count is stability-dictated"
                )
        else:
            # Normalize BEFORE building the partial and the cache key:
            # `substeps or 8` would silently run an invalid 0 at 8, and
            # None vs an explicit 8 would compile the same program twice.
            substeps = 8 if substeps is None else int(substeps)
            if substeps < 1:
                raise ValueError(f"substeps must be >= 1, got {substeps}")
            if mode in ("trbdf2", "trbdf2_refresh"):
                from heatx.engine.implicit import imp_march

                march_fn = partial(
                    imp_march, substeps=substeps,
                    refresh_h=(mode == "trbdf2_refresh"),
                    refresh_every=refresh_every,
                )
            elif mode == "exp":
                from heatx.engine.exponential import exp_march

                march_fn = partial(exp_march, substeps=substeps)
            else:
                raise ValueError(f"unknown mode {mode!r}")
        key = (collect_zone_T, collect_loads, collect_operative,
               mode, substeps, refresh_every)
        if key not in self._run:
            self._run[key] = jax.jit(partial(
                step_mod.run, collect_zone_T=collect_zone_T,
                collect_loads=collect_loads,
                collect_operative=collect_operative,
                march_fn=march_fn,
            ))
        return self._run[key](self._device(), state, inputs_seq)

    def zone_mrt(self, state: SimState) -> jax.Array:
        """Per-zone mean radiant temperature [Z] of a state — the Carroll
        exchange node over the zone's surface temperatures (a comfort
        observable, available whether or not ``config.interior_mrt`` drives
        the physics).  Operative temperature = ``(zone_T + zone_mrt)/2``."""
        from heatx.engine import surface as surf_mod

        if self._zone_mrt_fn is None:
            # Cached like the other jitted entry points: a fresh jax.jit
            # wrapper per call would re-trace on every invocation (a comfort
            # post-processing loop calls this per saved state).
            self._zone_mrt_fn = jax.jit(
                surf_mod.zone_mrt, static_argnames=("n_zones",)
            )
        b = self._device()
        return self._zone_mrt_fn(
            b.surfaces, state.node_T, state.zone_T, n_zones=b.n_zones
        )

    def run_checked(
        self, state: SimState, inputs_seq: StepInputs, collect_zone_T: bool = True
    ) -> Tuple[SimState, Optional[jax.Array]]:
        """Like :meth:`run`, with an in-graph finiteness guard after every
        main step (the reference's NaN asserts, model.rs:416-419): raises on
        the first non-finite state, reporting the step and zone."""
        if collect_zone_T not in self._run_checked:
            self._run_checked[collect_zone_T] = step_mod.make_checked_run_fn(
                collect_zone_T=collect_zone_T
            )
        return self._run_checked[collect_zone_T](self._device(), state, inputs_seq)

    def march_exp(
        self, state: SimState, inputs: StepInputs, substeps: int = 12
    ) -> SimState:
        """One main timestep in exponential-integrator fast mode: convection
        coefficients freeze for the step (EnergyPlus-style), massive nodes
        advance by the exact matrix exponential of the frozen system, and the
        step takes ``substeps`` sub-steps instead of the stability-dictated
        ``dt_subdivisions`` (often ~10x fewer).  See
        :mod:`heatx.engine.exponential` for accuracy semantics."""
        if self._march_exp is None:
            from heatx.engine.exponential import exp_march

            self._march_exp = jax.jit(exp_march, static_argnames=("substeps",))
        return self._march_exp(self._device(), state, inputs, substeps=substeps)

    def march_imp(
        self,
        state: SimState,
        inputs: StepInputs,
        substeps: int = 12,
        refresh_h: bool = False,
        refresh_every: int = None,
    ) -> SimState:
        """One main timestep in TR-BDF2 implicit fast mode: like
        :meth:`march_exp` (coefficients frozen per step, ~10x fewer
        sub-steps) but integrated with the L-stable TR-BDF2 scheme, which
        maps better onto TPU than the matrix exponential (tridiagonal solves
        instead of batched dense algebra).  This is the scheme behind the
        fused fast-mode Pallas kernel (heatx.ops.pallas_step mode="trbdf2").
        ``refresh_h=True`` re-evaluates the film coefficients and stage
        matrices every sub-step (kernel mode="trbdf2_refresh"): ~6x the
        frozen-h accuracy at the same sub-step count.  ``refresh_every=k``
        is the hybrid cadence (rebuild every k sub-steps; k must divide
        ``substeps``).  See :mod:`heatx.engine.implicit`."""
        _check_setpoint_order(self.building, inputs.heat_sp, inputs.cool_sp)
        if self._march_imp is None:
            from heatx.engine.implicit import imp_march

            self._march_imp = jax.jit(
                imp_march,
                static_argnames=("substeps", "refresh_h", "refresh_every"),
            )
        return self._march_imp(
            self._device(), state, inputs, substeps=substeps,
            refresh_h=refresh_h, refresh_every=refresh_every,
        )

    def fast_runner(
        self,
        block_size: int = 1024,
        mode: str = "parity",
        substeps: int = None,
        hours: int = 1,
        interpret: bool = None,
        collect_fluxes: bool = False,
        scheduled_setpoints: bool = False,
        mesh=None,
        collect_operative: bool = False,
        refresh_every: int = None,
    ) -> "FastRunner":
        """The fused Pallas hour-kernel path.

        mode="parity" (default) runs reference-parity sub-step physics
        (requires ``config.nomass_fixed_iters`` when the building has no-mass
        layers; validated against the EnergyPlus replay suite at 1-2).
        mode="trbdf2" runs the TR-BDF2 fast mode (h frozen per hour,
        ``substeps`` sub-steps instead of the stability-dictated ~120 —
        another ~8x on a TPU; see heatx.engine.implicit).
        mode="trbdf2_refresh" is TR-BDF2 with the film coefficients /
        cavity U / stage factorizations re-evaluated every ``refresh_every``
        sub-steps (default 1 = every sub-step, the parity path's
        coefficient cadence): ~14x the frozen-h accuracy (0.024 K vs
        0.33 K on the 3-week regime gate) at the fast mode's sub-step
        count; ``refresh_every=2`` keeps most of that accuracy at nearly
        frozen-mode cost (PERF.md cadence ablation).

        ``mesh=`` shards the kernel over a ``jax.sharding.Mesh`` (one
        zone-closed block group per device, no collectives) with the full
        high-level API available — see :class:`FastRunner`."""
        return FastRunner(
            self, block_size=block_size, mode=mode, substeps=substeps,
            hours=hours, interpret=interpret, collect_fluxes=collect_fluxes,
            scheduled_setpoints=scheduled_setpoints, mesh=mesh,
            collect_operative=collect_operative, refresh_every=refresh_every,
        )


def _check_setpoint_order(building, heat_sp, cool_sp):
    """Host-side sanity check of SCHEDULED setpoints: heating must stay
    below cooling wherever both are active.  compile_building enforces this
    for compiled thermostat values (layout.py), but a per-step schedule
    bypasses that check, and the zone update's heating branch takes
    priority — a transposed setback array would silently heat every zone
    to the cooling setpoint.  Best-effort: skipped for traced values and
    non-broadcastable shape pairs (the runners normalize those later)."""
    if heat_sp is None and cool_sp is None:
        return
    import numpy as np

    try:
        h = np.asarray(
            building.ctl_heat_sp if heat_sp is None else heat_sp, np.float64
        )
        c = np.asarray(
            building.ctl_cool_sp if cool_sp is None else cool_sp, np.float64
        )
        if h.size == 0 or c.size == 0:
            return
        hb, cb = np.broadcast_arrays(h, c)
    except Exception:
        return
    bad = (hb > -1e8) & (cb < 1e8) & (hb >= cb)
    if bad.any():
        i = np.argwhere(bad)[0]
        raise ValueError(
            "scheduled heating setpoint >= cooling setpoint at index "
            f"{tuple(int(x) for x in i)} ({float(hb[tuple(i)])} >= "
            f"{float(cb[tuple(i)])}): the heating branch would win every "
            "sub-step and hold the zone at the heating value (transposed "
            "schedule arrays are the usual cause)"
        )


class FastRunner:
    """High-level wrapper over the fused Pallas hour kernel: takes/returns
    ordinary :class:`SimState` objects and per-hour StepInputs, handling the
    zone-closed block permutation internally.

    Pass ``mesh=`` (a ``jax.sharding.Mesh``) to run the kernel sharded over
    the device mesh (shard_map over zone-closed blocks,
    heatx.parallel.sharding.make_sharded_hour_march): the whole high-level
    API — :meth:`run` with ``ground_hourly`` operand swaps, flux/load
    collection, setpoint schedules, the fail-fast finiteness check — works
    identically, with the blocked state and building operands living
    block-sharded on the mesh."""

    def __init__(
        self,
        tm: ThermalModel,
        block_size: int = 1024,
        interpret=None,
        mode: str = "parity",
        substeps: int = None,
        hours: int = 1,
        collect_fluxes: bool = False,
        scheduled_setpoints: bool = False,
        mesh=None,
        collect_operative: bool = False,
        refresh_every: int = None,
    ):
        import jax.numpy as jnp
        import numpy as np

        from heatx.ops import pallas_step

        self._tm = tm
        building = tm._device()
        # The REQUESTED block size: layout.block_size is rebound to the
        # padded per-block lane total (SBtot) after the node split, so
        # re-blocking with it (update_building) could pick a DIFFERENT
        # auto-split and fail the identical-layout check at scale.
        self._block_size = block_size
        self._bb = pallas_step.block_building(
            building, block_size=block_size,
            # The operative-T observable needs the Carroll statics even when
            # interior_mrt physics is off.
            mrt_statics=True if collect_operative else None,
        )
        if interpret is None:
            # Pallas TPU kernels only run compiled on TPU; fall back to the
            # interpreter elsewhere (tests, CPU experimentation).
            interpret = jax.default_backend() != "tpu" and not str(
                jax.devices()[0]
            ).startswith("TPU")
        self._substeps = (
            (substeps or building.dt_subdivisions)
            if mode == "parity"
            else (substeps or 12)
        )
        self._hours = hours
        self._collect_hq = collect_fluxes
        self._collect_op = collect_operative
        self._mesh = mesh
        # The per-hour finite count is always collected: one masked reduce
        # per hour is noise next to the sub-step work, and it is what lets
        # run(assert_finite=True) fail fast with hour resolution (the
        # reference asserts every sub-step, model.rs:416-419).
        # Zone-shaded buildings always take the shade-setpoint series operand
        # (so run(shade_sp=...) schedule gates work without a constructor
        # flag); the series defaults to the compiled setpoints.
        self._scheduled_shade = bool(building.has_zone_shading)
        self._mk_kwargs = dict(
            substeps=substeps, interpret=interpret, mode=mode,
            hours=hours, collect_bad=True, collect_hq=collect_fluxes,
            scheduled_setpoints=scheduled_setpoints,
            collect_operative=collect_operative,
            scheduled_shade_sp=self._scheduled_shade,
            refresh_every=refresh_every,
        )
        if mesh is not None:
            from heatx.parallel import sharding as _sharding

            self._hour_march, self._params = _sharding.make_sharded_hour_march(
                self._bb, mesh, **self._mk_kwargs
            )
        else:
            self._hour_march, self._params = pallas_step.make_hour_march(
                self._bb, **self._mk_kwargs
            )
        self._scheduled_sp = scheduled_setpoints
        self._jit = jax.jit(self._hour_march)
        self._run_jit = None
        self._dtype = building.config.dtype
        self._jnp = jnp
        self._np = np

    @property
    def layout(self):
        return self._bb.layout

    def set_ground_temperature(self, value: float) -> None:
        """Update every ground-contact face's soil temperature in the kernel
        operands (the fused-path analogue of
        :meth:`ThermalModel.set_ground_temperature`).  The blocked building
        rides as per-dispatch traced arguments, so the swap is a few device
        writes with no recompilation.

        The ground masks are static — they derive from the boundary codes —
        so they compute ONCE (host numpy) and each later swap is a single
        cached-jit where per operand.  The old per-call eager ``== / any``
        chain cost several device round trips per month of an annual run,
        which dominated small-model wall clock through a remote tunnel."""
        from heatx.build.layout import B_GROUND

        j = self._jnp
        idx = self._hour_march.param_index
        specs = getattr(self._hour_march, "param_specs", None)
        if getattr(self, "_ground_ks", None) is None:
            ks = []
            for side in ("front", "back"):
                for (pi, name), k in idx.items():
                    if name != f"{side}_temp":
                        continue
                    # Device-side mask (never np.asarray: a multi-process
                    # sharded operand has non-addressable shards); the any()
                    # reduction is replicated, so the bool fetch is legal on
                    # every process.
                    mask = self._params[idx[(pi, f"{side}_code")]] == B_GROUND
                    if bool(mask.any()):
                        ks.append((k, mask))
            self._ground_ks = ks
            self._gswap_jit = jax.jit(
                lambda mask, v, old: j.where(mask, v, old)
            )
        if not self._ground_ks:
            raise ValueError("model has no ground boundaries")
        params = list(self._params)
        v = j.asarray(value, self._dtype)
        for k, mask in self._ground_ks:
            new = self._gswap_jit(mask, v, params[k])
            if specs is not None:
                # Sharded runner: keep the swapped operand pinned to its
                # block sharding (eager propagation already preserves it;
                # the explicit put makes the invariant load-bearing).
                from jax.sharding import NamedSharding

                new = jax.device_put(
                    new, NamedSharding(self._hour_march.mesh, specs[k])
                )
            params[k] = new
        self._params = tuple(params)

    def update_building(self, building) -> None:
        """Swap ALL building-derived kernel operands for a same-layout
        :class:`CompiledBuilding` whose VALUES changed (e.g. scaled
        ``surfaces.seg_u`` during calibration).  The kernel reads the
        blocked building as per-dispatch traced arguments, so this is a
        host-side re-block + operand swap with **no recompilation** — the
        structural layout (node counts, block permutation, zone table) must
        be identical to the compiled one.

        Note: overrides any prior :meth:`set_ground_temperature` operand
        writes (re-apply them after).  On the sharded (``mesh=``) runner
        the fresh operands re-pin to the stored block shardings."""
        import numpy as np

        from heatx.ops import pallas_step

        bb2 = pallas_step.block_building(
            building, block_size=self._block_size,
            mrt_statics=True if self._collect_op else None,
        )
        if not np.array_equal(
            np.asarray(bb2.layout.surf_perm), np.asarray(self._bb.layout.surf_perm)
        ):
            raise ValueError(
                "update_building requires an identical blocked layout: "
                "re-discretized or re-ordered buildings need a fresh "
                "fast_runner (only value changes on the compiled arrays "
                "keep the layout)"
            )
        kw = dict(self._mk_kwargs)
        if self._mesh is not None:
            # Mirrors make_sharded_hour_march's per-device grid sizing (its
            # divisibility check already ran at construction; the layout
            # equality above guarantees n_blocks is unchanged).
            ndev = int(
                np.prod([self._mesh.shape[a] for a in self._mesh.axis_names])
            )
            kw["grid_blocks"] = bb2.n_blocks // ndev
        # make_hour_march also rebuilds the (discarded) kernel wrapper; the
        # cost is host-side numpy blocking, ~ms at building scale, paid once
        # per parameter UPDATE (chunk_forward caches on values), so a
        # params-only derivation path hasn't been worth splitting out.
        _, params2 = pallas_step.make_hour_march(bb2, **kw)
        if self._mesh is not None:
            from heatx.parallel.sharding import _put_spec_tree

            params2 = tuple(
                _put_spec_tree(
                    list(params2), self._mesh,
                    list(self._hour_march.param_specs),
                )
            )
        old, new = self._params, tuple(params2)
        if len(old) != len(new) or any(
            getattr(a, "shape", None) != getattr(b, "shape", None)
            for a, b in zip(old, new)
        ):
            raise ValueError(
                "update_building produced different operand shapes; the "
                "building's structure changed"
            )
        self._bb = bb2
        self._params = new
        # A manual operand swap must not be shadowed by a stale
        # chunk_forward/chunk_grad value-sync (see _sync_params).
        self._param_key = None

    def chunk_forward(
        self, apply_params, loss_fn, collect_loads=False, schedule_fn=None,
        **run_kw,
    ):
        """A kernel-speed ``forward_fn`` for
        :func:`heatx.engine.adjoint.chunked_value_and_grad`.

        ``apply_params(params) -> CompiledBuilding`` maps the optimization
        parameters to a same-layout building (value changes only — e.g.
        ``dataclasses.replace(building, surfaces=...)``);
        ``loss_fn(zt_hist, xs) -> scalar`` scores one chunk from its
        per-hour zone-temperature history ``[H, zones]`` (the same history
        the XLA ``chunk_fn`` must score, so forward and backward agree).
        With ``collect_loads=True`` (setpoint-driven HVAC only) the
        contract becomes ``loss_fn(zt_hist, loads_hist, xs)`` with
        ``loads_hist`` the [H, zones] per-hour mean ideal-load powers (W,
        heating +, cooling −) — the demand/energy objective channel.
        ``schedule_fn(params, xs) -> {"heat_sp": [H, Z], "cool_sp": ...}``
        (scheduled-setpoints runners) derives the chunk's setpoint
        schedules FROM the optimization parameters — the optimal-control
        contract; the returned series override ``xs``'s, and the paired
        :meth:`chunk_grad` pulls the schedule cotangents back through the
        same map.  Extra ``run_kw`` pass through to :meth:`run`.

        The returned ``forward_fn(params, state, xs)`` re-blocks the kernel
        operands only when the parameter VALUES change (once per optimizer
        step, not once per chunk), then runs the fused kernel over the
        chunk's hours.  Pair it with an XLA ``chunk_fn`` built on the same
        integrator (``ThermalModel.march_imp`` with this runner's mode /
        substeps) — the arithmetic matches bit-for-bit in f64
        (tests/test_pallas_imp.py), so the backward sweep's gradients are
        the kernel trajectory's gradients to fp tolerance."""
        if schedule_fn is not None and not self._scheduled_sp:
            raise ValueError(
                "schedule_fn requires a scheduled_setpoints=True runner"
            )
        # Contract record for the paired chunk_grad: a backward built on
        # this runner with diverging trajectory options would silently
        # differentiate a DIFFERENT trajectory (ADVICE r4) — chunk_grad
        # checks this and raises on mismatch.
        self._fw_contract = dict(
            interp_weather=bool(run_kw.get("interp_weather", False)),
            collect_loads=bool(collect_loads),
            schedule_fn=schedule_fn,
        )

        def forward_fn(params, state, xs):
            self._sync_params(apply_params, params)
            if schedule_fn is not None:
                xs = xs._replace(**schedule_fn(params, xs))
            if collect_loads:
                final, zt, ld = self.run(
                    state, xs, collect_loads=True, **run_kw
                )
                return final, loss_fn(zt, ld, xs)
            final, zt = self.run(state, xs, **run_kw)
            return final, loss_fn(zt, xs)

        return forward_fn

    def _sync_params(self, apply_params, params):
        """Re-block the kernel operands iff the parameter VALUES changed —
        shared by chunk_forward and chunk_grad so one optimizer step
        re-blocks once, not once per sweep.  The cache key holds the
        ``apply_params`` callable ITSELF (not its ``id()``: after the
        original callable is garbage-collected a new one can land at the
        same address, and identical parameter bytes would then silently
        skip the sync against a stale building): two forwards built with
        DIFFERENT parameter maps must not share a sync (same values through
        a different map is a different building), and
        :meth:`update_building` invalidates the key so a manual operand
        swap is never shadowed by a stale sync."""
        import numpy as np

        value_key = tuple(
            np.asarray(v).tobytes() for v in jax.tree.leaves(params)
        )
        if (
            getattr(self, "_param_fn", None) is not apply_params
            or getattr(self, "_param_key", None) != value_key
        ):
            self.update_building(apply_params(params))
            self._param_fn = apply_params
            self._param_key = value_key

    def _check_grad_scope(self, apply_params, params, has_loads):
        """Raise if ``apply_params`` routes parameters into building arrays
        the adjoint kernel does NOT differentiate (cavity gas property
        tensors, capacity clamps, mixing/vent/shade tables, boundary codes):
        a calibration against those would silently receive zero gradient
        (VERDICT r4 weak #1).  Probe: one forward-mode JVP of the
        non-differentiated building leaves along a pseudo-random parameter
        tangent — any nonzero output tangent is a dependence the kernel
        backward drops.  Runs once per (apply_params, param structure)."""
        import dataclasses as _dc

        import jax.numpy as jnp
        import numpy as np

        from heatx.ops import pallas_adjoint

        key = (apply_params, jax.tree.structure(params))
        if getattr(self, "_scope_ok", None) == key:
            return
        diff_surf = set(pallas_adjoint.DIFF_NODE + pallas_adjoint.DIFF_SURF)
        skip_bld = {"surfaces", "zone_volume", "discretizations", "config"}
        if has_loads:
            skip_bld |= {"ctl_heat_sp", "ctl_cool_sp"}

        def leaves_of(v):
            return [
                x
                for x in jax.tree.leaves(v)
                if hasattr(x, "dtype") and jnp.issubdtype(
                    jnp.asarray(x).dtype, jnp.inexact
                )
            ]

        def nondiff(p):
            bd = apply_params(p)
            out = {}
            for f in _dc.fields(type(bd.surfaces)):
                if f.name in diff_surf:
                    continue
                ls = leaves_of(getattr(bd.surfaces, f.name))
                if ls:
                    out["surfaces." + f.name] = ls
            for f in _dc.fields(type(bd)):
                if f.name in skip_bld:
                    continue
                ls = leaves_of(getattr(bd, f.name))
                if ls:
                    out[f.name] = ls
            return out

        rng = np.random.default_rng(0)

        def tangent(x):
            x = jnp.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.inexact):
                return jnp.asarray(rng.standard_normal(x.shape), x.dtype)
            return np.zeros(np.shape(x), jax.dtypes.float0)

        tans = jax.tree.map(tangent, params)
        _, tout = jax.jvp(nondiff, (params,), (tans,))
        counts = jax.device_get(
            jax.tree.map(lambda t: jnp.sum(t != 0), tout)
        )
        bad = sorted(
            name
            for name, cs in counts.items()
            if any(int(c) > 0 for c in cs)
        )
        if bad:
            raise ValueError(
                f"chunk_grad: apply_params feeds building arrays the "
                f"adjoint kernel does not differentiate: {bad}.  Their "
                "gradients would silently be zero — use the XLA backward "
                "(chunked_value_and_grad without backward_fn) for these "
                "parameters"
            )
        self._scope_ok = key

    def chunk_grad(
        self,
        apply_params,
        loss_fn,
        interp_weather: bool = False,
        vmem_limit_mb: float = None,
        collect_loads: bool = False,
        schedule_fn=None,
        **run_kw,
    ):
        """A kernel-speed ``backward_fn`` for
        :func:`heatx.engine.adjoint.chunked_value_and_grad` — the adjoint
        day kernel (:mod:`heatx.ops.pallas_adjoint`) run day-by-day in
        reverse over the chunk.  Pair with :meth:`chunk_forward` built from
        the SAME ``apply_params``/``loss_fn``: value and gradient then both
        run fused in VMEM (~45x the XLA backward at bench scale).

        Contract (matching chunk_forward): ``apply_params(params)`` maps the
        optimization parameters to a same-layout CompiledBuilding with jnp
        arithmetic (jax.vjp pulls the building-array cotangents back through
        it), and ``loss_fn(zt_hist, xs) -> scalar`` scores the chunk from
        its per-hour zone-temperature history.  With ``collect_loads=True``
        (matching the paired chunk_forward) the contract becomes
        ``loss_fn(zt_hist, loads_hist, xs)`` and the per-hour ideal-load
        cotangent is seeded into the adjoint kernel — demand/kWh objectives
        run the kernel backward too.  The objective must flow through
        ``zt_hist`` / ``loads_hist`` and the carried (node_T, zone_T) state
        only — cotangents arriving on the h/q observables are not
        propagated.

        Differentiated building parameters: the DIFF_NODE/DIFF_SURF arrays
        and zone_volume of heatx.ops.pallas_adjoint (mass, seg_u, alphas,
        area, perimeter, cos_tilt, wind_mod, emissivities, rf, boundary
        temps, fixed h), plus the compiled thermostat setpoint rows
        (``ctl_heat_sp``/``ctl_cool_sp``) on thermostatic buildings.  With
        ``schedule_fn`` (scheduled-setpoints runners) the per-hour
        heat/cool schedule cotangents pull back through the same map the
        paired chunk_forward used — optimal setpoint control at kernel
        speed.  Parameters feeding only other arrays (cavity gas
        properties, capacity clamps, mixing/vent tables) RAISE on the
        first backward call instead of silently zeroing
        (:meth:`_check_grad_scope`) — use the XLA backward for those.

        Scope: the TR-BDF2 modes and parity mode (which unrolls the
        stability-dictated sub-step count — requires
        ``config.nomass_fixed_iters``; the unrolled trace is large at the
        default ~118 sub-steps/hour), on single-device AND ``mesh=``
        runners (the adjoint kernel shard_maps over zone-closed blocks
        exactly like the forward — multi-chip calibration), without
        in-run shading/vent gates or mid-chunk ground swaps.  ``run_kw``
        must match the paired chunk_forward's (trajectory-affecting
        options the backward recompute cannot honor raise here)."""
        import numpy as np

        from heatx.engine.state import SimState
        from heatx.ops import pallas_adjoint

        # Trajectory-affecting run() options the backward recompute does NOT
        # honor must fail loudly: a chunk_forward(ground_hourly=...) paired
        # with this backward would silently differentiate a DIFFERENT
        # trajectory (ADVICE r4).  Trajectory-neutral keys are accepted and
        # ignored (they only change what the forward collects/checks).
        _neutral = {
            "assert_finite", "dispatch_days", "collect_zone_T",
            "collect_fluxes", "collect_operative",
        }
        unsupported = set(run_kw) - _neutral
        if unsupported:
            raise ValueError(
                f"chunk_grad: run options {sorted(unsupported)} change the "
                "forward trajectory in ways the kernel backward does not "
                "recompute (use the XLA backward, or drop them from the "
                "paired chunk_forward)"
            )

        mk = self._mk_kwargs
        if self._scheduled_shade:
            raise ValueError(
                "chunk_grad: in-run zone shading is not supported (use the "
                "XLA backward)"
            )
        has_loads = getattr(self._hour_march, "collect_loads", False)
        if collect_loads and not has_loads:
            raise ValueError(
                "chunk_grad(collect_loads=True) requires setpoint-driven "
                "HVAC (IdealHeaterCooler with heat/cool setpoints)"
            )
        if schedule_fn is not None and not self._scheduled_sp:
            raise ValueError(
                "schedule_fn requires a scheduled_setpoints=True runner"
            )
        fw = getattr(self, "_fw_contract", None)
        if fw is not None:
            # The paired chunk_forward's trajectory options must match:
            # a mismatch means the backward recomputes (and
            # differentiates) a different trajectory than the forward
            # marched.  Build the backward on a fresh runner to pair
            # deliberately different contracts.
            mine = dict(
                interp_weather=bool(interp_weather),
                collect_loads=bool(collect_loads),
                # Callables compare by PRESENCE only (callers routinely
                # rebuild closure wrappers per chunk).
                schedule_fn=schedule_fn is not None,
            )
            ref = dict(fw, schedule_fn=fw["schedule_fn"] is not None)
            bad = [k for k in mine if mine[k] != ref[k]]
            if bad:
                raise ValueError(
                    f"chunk_grad: {bad} differ from this runner's last "
                    "chunk_forward — the backward would differentiate a "
                    "different trajectory.  Pass matching options (or use "
                    "a separate runner for an intentionally different "
                    "pairing)"
                )
        grid_blocks = None
        if self._mesh is not None:
            # Mirror the sharded forward: per-device grids of
            # n_blocks/n_devices zone-closed blocks (the adjoint of a
            # block-local forward is block-local — no collectives).
            ndev = int(np.prod(
                [self._mesh.shape[a] for a in self._mesh.axis_names]
            ))
            grid_blocks = self._bb.n_blocks // ndev
        adj = pallas_adjoint.make_day_adjoint(
            self._bb,
            substeps=self._substeps,
            mode=mk["mode"],
            hours=self._hours,
            refresh_every=mk["refresh_every"],
            interpret=mk["interpret"],
            # The adjoint's vjp residuals need more scoped VMEM than the
            # stock 16 MB heuristic admits at bench shapes; 100 MB is the
            # measured-safe setting (PERF.md round-4).
            vmem_limit_mb=(100.0 if vmem_limit_mb is None else vmem_limit_mb),
            scheduled_setpoints=self._scheduled_sp,
            grid_blocks=grid_blocks,
        )
        if self._mesh is not None:
            from heatx.parallel.sharding import shard_day_adjoint

            adj = shard_day_adjoint(
                adj, self._hour_march, self._mesh,
                with_ld_cot=collect_loads,
            )
        j = self._jnp
        H = self._hours
        NB, ZB = self._bb.n_blocks, self._bb.zones_per_block
        hour_march = self._hour_march
        # Drift guard: the adjoint kernel re-derives the forward kernel's
        # operand ordering from the shared _prep_parts; assert the two
        # enumerate the same building-operand keys in the same order so a
        # forward-side operand addition that is not mirrored in the
        # adjoint fails HERE instead of shifting refs into garbage
        # gradients.
        fwd_order = tuple(
            k for k, _ in sorted(
                hour_march.param_index.items(), key=lambda kv: kv[1]
            )
        )
        if fwd_order != adj.param_order:
            raise AssertionError(
                "forward/adjoint kernel operand layouts diverged: "
                f"{fwd_order} vs {adj.param_order}"
            )

        # Interior-MRT buildings: the adjoint also differentiates the
        # Carroll effective-emissivity operands; their cotangents pull back
        # through the differentiable blocking-statics twin below.
        mrt_names = tuple(sorted({
            name
            for (_, name, kind) in adj.diff_entries
            if name in ("mrt_eps_f", "mrt_eps_b")
        }))

        # Position of the per-hour ideal-load history in the hour-march
        # outputs: (T, zT, hq, zt_hist, [hq_hist], bad, [ld_hist], [top]).
        ld_idx = 5 + (1 if self._collect_hq else 0)

        @jax.jit
        def fwd_scan(params, T, zT, tuples):
            def body(carry, tup):
                T, zT = carry
                outs = hour_march(params, T, zT, tup)
                ys = (T, zT, outs[3]) + (
                    (outs[ld_idx],) if collect_loads else ()
                )
                return (outs[0], outs[1]), ys

            (T, zT), ys = jax.lax.scan(body, (T, zT), tuples)
            return (T, zT) + ys

        sched = self._scheduled_sp

        @jax.jit
        def bwd_scan(params, dT, dzT, tuples, T0s, zT0s, d_zts, d_lds):
            def body(carry, x):
                dT, dzT, acc = carry
                tup, T0d, zT0d, dz, dl = x
                g = adj(params, T0d, zT0d, tup, (dT, dzT, dz, dl))
                contrib = dict(g["d_params"])
                contrib["zone_volume"] = g["d_zone_volume"]
                if has_loads:
                    contrib["ctl_heat"] = g["d_ctl_heat"]
                    contrib["ctl_cool"] = g["d_ctl_cool"]
                acc = jax.tree.map(j.add, acc, contrib)
                ys = (
                    (g["d_sp_heat"], g["d_sp_cool"]) if sched else None
                )
                return (g["dT0"], g["d_zT0"], acc), ys

            # Zero accumulators shaped like one day's contributions (the
            # adjoint returns full blocked layouts: [N, SP] node, [SP]
            # surface, [NB, ZB] zone arrays).
            SPl = self._bb.layout.padded_surfaces
            Nn = self._bb.max_nodes
            dt = self._dtype
            acc0 = {
                name: j.zeros((Nn, SPl), dt)
                for name in pallas_adjoint.DIFF_NODE
            }
            acc0.update(
                {name: j.zeros((SPl,), dt) for name in pallas_adjoint.DIFF_SURF}
            )
            acc0.update({name: j.zeros((SPl,), dt) for name in mrt_names})
            acc0["zone_volume"] = j.zeros((NB, ZB), dt)
            if has_loads:
                acc0["ctl_heat"] = j.zeros((NB, ZB), dt)
                acc0["ctl_cool"] = j.zeros((NB, ZB), dt)
            rev = lambda a: j.flip(a, axis=0)  # noqa: E731
            (dT, dzT, acc), sp_ys = jax.lax.scan(
                body,
                (dT, dzT, acc0),
                (
                    jax.tree.map(rev, tuples),
                    jax.tree.map(rev, T0s),
                    rev(zT0s),
                    rev(d_zts),
                    jax.tree.map(rev, d_lds),  # None (no loads loss) is inert
                ),
            )
            # The scan walks days in reverse; flip the per-day schedule
            # cotangents back to forward order.
            sp_cots = jax.tree.map(rev, sp_ys) if sched else None
            return dT, dzT, acc, sp_cots

        def _day_tuples(xs, T_steps):
            """The chunk's per-day hour-input tuples, stacked [D, ...] —
            the same prep transforms run() applies (weather repeat/interp,
            jitted channel blocker, device-side gains)."""
            self._ensure_chunk_prep()
            gains_all = self._gains_dev(xs, T_steps)
            a_gain, b_gain = gains_all[:2]
            w_xs = tuple(
                self._weather_xs(v, T_steps, interp_weather)
                for v in (xs.t_out, xs.wind_speed, xs.wind_direction)
            )
            surf_raw = (xs.sol_front, xs.sol_back, xs.ir_front, xs.ir_back)

            def time_leading(v):
                sh = np.shape(v)
                if len(sh) == 2 and sh[0] == T_steps:
                    return True
                return len(sh) == 1 and sh[0] == T_steps

            surf_is_ts = tuple(time_leading(v) for v in surf_raw)
            surf_raw = tuple(j.asarray(v, self._dtype) for v in surf_raw)
            sp_c = ()
            if sched:
                # Same schedule normalization as run(): [T]/[T, Z] series,
                # scalar/[Z]/[1, Z] constants; compiled rows by default.
                bm = self._tm.building
                Z = bm.n_zones

                def sp_arr(v, compiled):
                    if v is None:
                        return j.asarray(compiled, self._dtype)
                    sh = np.shape(v)
                    if len(sh) == 1 and sh[0] == T_steps:
                        return j.asarray(v, self._dtype)[:, None]
                    if len(sh) <= 1:
                        return j.broadcast_to(
                            j.asarray(v, self._dtype), (Z,)
                        )
                    if sh[0] == 1:
                        return j.asarray(v, self._dtype)[0]
                    return j.asarray(v, self._dtype)

                sp_c = (
                    sp_arr(xs.heat_sp, bm.ctl_heat_sp),
                    sp_arr(xs.cool_sp, bm.ctl_cool_sp),
                )
            blocked = self._chunk_prep_jit(
                surf_raw, (a_gain, b_gain), (), sp_c, (),
                T_steps=T_steps, is_ts=surf_is_ts,
            )
            return w_xs + tuple(blocked)

        def backward_fn(params, state, xs, state_cot, loss_cot):
            self._sync_params(apply_params, params)
            self._check_grad_scope(apply_params, params, has_loads)
            if schedule_fn is not None:
                xs = xs._replace(**schedule_fn(params, xs))
            T_steps = np.shape(np.asarray(xs.t_out))[0]
            if T_steps % H:
                raise ValueError(
                    f"chunk length {T_steps} not divisible by the runner's "
                    f"hours={H}"
                )
            tuples = _day_tuples(xs, T_steps)
            to_blocked, _ = self._converters()
            T, zT = to_blocked(state.node_T, state.zone_T)
            outs = fwd_scan(self._params, T, zT, tuples)
            T0s, zT0s, zts = outs[2:5]
            lds = outs[5] if collect_loads else None

            idx = self._layout_idx()
            zin = self._zinv_d

            def zone_blocked(d):
                return j.where(idx.zt_ok[None], d[:, idx.zt_c], 0.0).reshape(
                    T_steps // H, H, NB, ZB
                )

            zt_flat = zts.reshape(T_steps, NB * ZB)[:, zin]
            if collect_loads:
                ld_flat = lds.reshape(T_steps, NB * ZB)[:, zin]
                _, lvjp = jax.vjp(
                    lambda z, l: loss_fn(z, l, xs), zt_flat, ld_flat
                )
                d_zt, d_ld = lvjp(j.asarray(loss_cot, zt_flat.dtype))
                d_ld_b = zone_blocked(d_ld)
            else:
                _, lvjp = jax.vjp(lambda z: loss_fn(z, xs), zt_flat)
                (d_zt,) = lvjp(j.asarray(loss_cot, zt_flat.dtype))
                d_ld_b = None
            d_zt_b = zone_blocked(d_zt)

            dT, dzT = to_blocked(state_cot.node_T, state_cot.zone_T)
            dT, dzT, acc, sp_cots = bwd_scan(
                self._params, dT, dzT, tuples, T0s, zT0s, d_zt_b, d_ld_b
            )
            params_cot, node_cot, zone_cot = adj_pullback(
                params, acc, dT, dzT
            )
            if schedule_fn is not None:
                params_cot = sched_pullback(params, xs, sp_cots, params_cot)
            state_cot_out = jax.tree.map(j.zeros_like, state_cot)._replace(
                node_T=node_cot.astype(state_cot.node_T.dtype),
                zone_T=zone_cot.astype(state_cot.zone_T.dtype),
            )
            return params_cot, state_cot_out

        def sched_pullback(params, xs, sp_cots, params_cot):
            """Pull the per-hour schedule cotangents back through
            ``schedule_fn`` and add them into the parameter gradient.
            ``schedule_fn`` must return full [H, Z] series (the cotangent
            must match the primal's shape)."""
            d_h, d_c = sp_cots  # [D, H, NB, ZB] each
            T_steps = d_h.shape[0] * d_h.shape[1]
            zin = self._zinv_d

            def flat(d):
                return d.reshape(T_steps, NB * ZB)[:, zin]

            sp_out, svjp = jax.vjp(lambda p: schedule_fn(p, xs), params)
            cot = {}
            for key, d in (("heat_sp", d_h), ("cool_sp", d_c)):
                if key not in sp_out:
                    continue
                prim = sp_out[key]
                dflat = flat(d).astype(j.asarray(prim).dtype)
                if np.shape(prim) != dflat.shape:
                    raise ValueError(
                        f"schedule_fn must return full [chunk_hours, zones] "
                        f"series; got {key} shape {np.shape(prim)}, "
                        f"expected {dflat.shape}"
                    )
                cot[key] = dflat
            (sched_cot,) = svjp(cot)
            return jax.tree.map(j.add, params_cot, sched_cot)

        # Pull the blocked cotangents back to the params pytree in ONE
        # jitted call (layout-adjoint gathers + jax.vjp through
        # apply_params) — the eager numpy version cost several host round
        # trips per chunk.
        names = pallas_adjoint.DIFF_NODE + pallas_adjoint.DIFF_SURF

        if mrt_names:
            from heatx.ops import pallas_step as _ps

            _bbx = self._bb
            _mrt_part = _ps._mrt_part_mask(
                _bbx.surfaces, _bbx.front_oh, _bbx.back_oh, NB,
                _bbx.zones_per_block,
            )
            _mrt_oh = (
                np.asarray(_bbx.front_oh, np.float64),
                np.asarray(_bbx.back_oh, np.float64),
            )

        def extract(p):
            bd = apply_params(p)
            d = {name: getattr(bd.surfaces, name) for name in names}
            d["zone_volume"] = bd.zone_volume
            if has_loads:
                # Compiled thermostat setpoints are calibration targets too
                # (d_ctl_heat/d_ctl_cool from the adjoint kernel).
                d["ctl_heat_sp"] = bd.ctl_heat_sp
                d["ctl_cool_sp"] = bd.ctl_cool_sp
            if mrt_names:
                # Recompute the Carroll effective emissivities with the
                # DIFFERENTIABLE twin of the blocking statics so the
                # adjoint kernel's mrt_eps cotangents chain back into
                # area/eps (pallas_step.mrt_eps_blocked_jnp).
                from heatx.ops import pallas_step as _ps2

                idx = self._layout_idx()

                def blocked_surf(a, fill):
                    return j.where(
                        idx.perm_ok, j.asarray(a, self._dtype)[idx.perm_c],
                        fill,
                    )

                with jax.default_matmul_precision("highest"):
                    mef, meb = _ps2.mrt_eps_blocked_jnp(
                        blocked_surf(bd.surfaces.area, 1.0),
                        blocked_surf(bd.surfaces.eps_front, 0.0),
                        blocked_surf(bd.surfaces.eps_back, 0.0),
                        _mrt_part, _mrt_oh[0], _mrt_oh[1], NB,
                        self._bb.zones_per_block,
                    )
                if "mrt_eps_f" in mrt_names:
                    d["mrt_eps_f"] = mef
                if "mrt_eps_b" in mrt_names:
                    d["mrt_eps_b"] = meb
            return d

        @jax.jit
        def adj_pullback(params, acc, dT, dzT):
            idx = self._layout_idx()
            zin = self._zinv_d
            outv, pvjp = jax.vjp(extract, params)
            cot = {
                name: acc[name][..., idx.inv_d].astype(outv[name].dtype)
                for name in names
            }
            cot["zone_volume"] = (
                acc["zone_volume"].reshape(NB * ZB)[zin]
                .astype(outv["zone_volume"].dtype)
            )
            if has_loads:
                for src, dst in (
                    ("ctl_heat", "ctl_heat_sp"), ("ctl_cool", "ctl_cool_sp")
                ):
                    cot[dst] = (
                        acc[src].reshape(NB * ZB)[zin]
                        .astype(outv[dst].dtype)
                    )
            for n in mrt_names:
                # Already in the blocked [SP] layout extract produced.
                cot[n] = acc[n].astype(outv[n].dtype)
            (params_cot,) = pvjp(cot)
            node_cot = dT[:, idx.inv_d]
            zone_cot = dzT.reshape(NB * ZB)[zin]
            return params_cot, node_cot, zone_cot

        self._converters()  # ensure _zinv_d before the first jitted call

        return backward_fn

    def _layout_idx(self):
        """Cached device-side layout permutation indices, shared by every
        blocked<->flat conversion site (state converters, the jitted input
        prep, the setpoint blocker) so the derivation lives in one place."""
        if getattr(self, "_lidx", None) is None:
            import types

            import numpy as np

            j = self._jnp
            lay = self._bb.layout
            b = self._tm.building
            S, Z = b.n_surfaces, b.n_zones
            perm = np.asarray(lay.surf_perm)  # [SP] -> surface id or -1
            inv = np.zeros(S, np.int64)  # surface id -> blocked lane
            inv[perm[perm >= 0]] = np.nonzero(perm >= 0)[0]
            zt = np.asarray(lay.zone_table)  # [NB, ZB] -> zone id or -1
            zt_flat = zt.reshape(-1)
            zinv = np.zeros(Z, np.int64)  # zone id -> blocked slot
            zinv[zt_flat[zt_flat >= 0]] = np.nonzero(zt_flat >= 0)[0]
            self._lidx = types.SimpleNamespace(
                perm_c=j.asarray(np.maximum(perm, 0)),
                perm_ok=j.asarray(perm >= 0),
                inv_d=j.asarray(inv),
                zt_c=j.asarray(np.maximum(zt, 0)),
                zt_ok=j.asarray(zt >= 0),
                zinv_d=j.asarray(zinv),
            )
        return self._lidx

    def _converters(self):
        """Jitted device-side blocked<->SimState layout converters.

        The permutations run as device gathers: the numpy versions pulled
        every output through the host, and on a remote-TPU runtime the
        12 transfer round-trips cost more than an entire annual kernel run.
        """
        if getattr(self, "_conv", None) is None:
            j = self._jnp
            idx = self._layout_idx()
            perm_c, perm_ok, inv_d = idx.perm_c, idx.perm_ok, idx.inv_d
            zt_c, zt_ok, zinv_d = idx.zt_c, idx.zt_ok, idx.zinv_d
            dt = self._dtype
            NB, ZB = self._bb.n_blocks, self._bb.zones_per_block

            @jax.jit
            def to_blocked(node_T, zone_T):
                T = j.where(perm_ok[None, :], node_T.astype(dt)[:, perm_c], 0.0)
                zT = j.where(zt_ok, zone_T.astype(dt)[zt_c], 0.0)
                return T, zT

            @jax.jit
            def from_blocked(T, zT, hq):
                node_T = T[:, inv_d]
                zone_T = zT.reshape(NB * ZB)[zinv_d]
                hf, hb, qf, qb = (x[inv_d] for x in hq)
                return SimState(
                    node_T=node_T, zone_T=zone_T, h_front=hf, h_back=hb,
                    q_front=qf, q_back=qb,
                )

            self._conv = (to_blocked, from_blocked)
            self._zinv_d = zinv_d
        return self._conv

    def to_blocked(self, state: SimState):
        """SimState -> (T_blocked, zT_blocked) (device-side gathers)."""
        return self._converters()[0](state.node_T, state.zone_T)

    def from_blocked(self, T, zT, hq=None) -> SimState:
        """(T_blocked, zT_blocked[, hq]) -> SimState (device-side)."""
        if hq is None:
            z = self._jnp.zeros((self._bb.layout.padded_surfaces,), self._dtype)
            hq = (z, z, z, z)
        return self._converters()[1](T, zT, tuple(hq))

    def hour_inputs(self, inputs: StepInputs):
        """Per-hour StepInputs -> the kernel's hour-input tuple (weather
        broadcast over sub-steps; per-surface arrays permuted into blocks;
        zone gains pre-summed)."""
        import numpy as np

        j = self._jnp
        b = self._tm.building
        bb = self._bb
        lay = bb.layout
        sub = self._substeps
        dt = self._dtype

        def per_sub(v):
            a = j.asarray(v, dt)
            return j.broadcast_to(a, (sub,)) if a.ndim == 0 else a

        def blocked_s(v):
            a = np.broadcast_to(np.asarray(v), (b.n_surfaces,))
            return j.asarray(lay.surfaces_to_blocked(a), dt)

        # Per-zone A/B gain terms (hvac + luminaire + infiltration/ventilation)
        from heatx.constants import KELVIN
        from heatx.physics import gas as gas_mod

        a_gain = np.zeros(b.n_zones)
        if b.hvac_pair_unit.size:
            np.add.at(
                a_gain,
                np.asarray(b.hvac_pair_space),
                np.asarray(inputs.hvac_power)[np.asarray(b.hvac_pair_unit)],
            )
        if b.lum_space.size:
            np.add.at(a_gain, np.asarray(b.lum_space), np.asarray(inputs.lum_power))
        b_gain = np.zeros(b.n_zones)
        gate = self._bb.vent is not None
        vent_rows = None
        for kind, vol, temp, mask in [
            ("inf", inputs.inf_vol, inputs.inf_temp, inputs.inf_mask),
            ("vent", inputs.vent_vol, inputs.vent_temp, inputs.vent_mask),
        ]:
            vol = np.asarray(vol)
            temp = np.asarray(temp)
            mask = np.asarray(mask)
            t_k = temp + KELVIN
            term = np.where(
                mask,
                np.asarray(gas_mod.density(gas_mod.AIR, t_k))
                * vol
                * np.asarray(gas_mod.heat_capacity(gas_mod.AIR, t_k)),
                0.0,
            )
            # Mask the product too (a masked-off channel may carry NaN
            # temperatures; 0 * NaN = NaN) — matches zone.air_exchange.
            if kind == "vent" and gate:
                # In-run ventilation gates: route the WHOLE vent channel
                # through the kernel's gated A/B rows (indoor gates run
                # in-kernel from the carry zone T; the weather-only
                # outdoor/wind gates apply here, like engine.step.
                # apply_vent_gates' step-mean evaluation).  Ungated
                # zones' no-op limits always pass, so this is the same
                # sum in the same order.
                tmean = float(np.mean(np.asarray(inputs.t_out)))
                wmean = float(np.mean(np.asarray(inputs.wind_speed)))
                out_ok = (
                    (tmean > np.asarray(b.vent_min_tout))
                    & (tmean < np.asarray(b.vent_max_tout))
                    & (wmean < np.asarray(b.vent_max_wind))
                )
                a_v = np.where(mask & out_ok, term * temp, 0.0)
                b_v = np.where(out_ok, term, 0.0)
                thr = np.asarray(b.vent_delta, np.float64) + tmean
                vent_rows = tuple(
                    j.asarray(lay.zones_to_blocked(x), dt)
                    for x in (a_v, b_v, thr)
                )
            else:
                a_gain = a_gain + np.where(mask, term * temp, 0.0)
                b_gain = b_gain + term

        out = (
            per_sub(inputs.t_out),
            per_sub(inputs.wind_speed),
            per_sub(inputs.wind_direction),
            blocked_s(inputs.sol_front),
            blocked_s(inputs.sol_back),
            blocked_s(inputs.ir_front),
            blocked_s(inputs.ir_back),
            j.asarray(lay.zones_to_blocked(a_gain), dt),
            j.asarray(lay.zones_to_blocked(b_gain), dt),
        )
        if vent_rows is not None:
            out = out + vent_rows
        has_sp = inputs.heat_sp is not None or inputs.cool_sp is not None
        if has_sp and not self._scheduled_sp:
            raise ValueError(
                "construct the runner with scheduled_setpoints=True to pass "
                "StepInputs.heat_sp/cool_sp through the kernel"
            )
        if has_sp:
            _check_setpoint_order(b, inputs.heat_sp, inputs.cool_sp)
        if self._scheduled_sp:
            # Per-call constant setpoints ([Z] or scalar; hour-resolved
            # schedules go through FastRunner.run), held for this chunk.
            NBb, ZBb = bb.n_blocks, bb.zones_per_block

            def sp_rows(v, compiled):
                a = np.broadcast_to(
                    np.asarray(compiled if v is None else v, np.float64),
                    (b.n_zones,),
                )
                row = lay.zones_to_blocked(a)
                return j.broadcast_to(
                    j.asarray(row, dt)[None], (self._hours, NBb, ZBb)
                )

            out = out + (
                sp_rows(inputs.heat_sp, b.ctl_heat_sp),
                sp_rows(inputs.cool_sp, b.ctl_cool_sp),
            )
        if inputs.shade_sp is not None and not self._scheduled_shade:
            raise ValueError(
                "StepInputs.shade_sp requires in-run zone-shading controls "
                "(BuildingModel.add_zone_shading)"
            )
        if self._scheduled_shade:
            # Zone-shading setpoint series, held for this call (schedule
            # gates pass +1e9 on blocked hours); defaults to the compiled
            # per-pane setpoints.  Padded lanes have all-zero gather
            # one-hots, so their value is inert.
            sv = b.shade_sp if inputs.shade_sp is None else inputs.shade_sp
            a = np.broadcast_to(np.asarray(sv, np.float64), (b.n_surfaces,))
            row = j.asarray(lay.surfaces_to_blocked(a, fill=1e9), dt)
            out = out + (
                j.broadcast_to(row[None], (self._hours, row.shape[0])),
            )
        return out

    def _gains_dev(self, inputs_seq, T_steps):
        """Per-hour zone A/B gain terms for a [T, ...] input sequence —
        DEVICE-side (jitted; the host-numpy version was O(T x Z) per call,
        which dominated wall-clock for annual runs at scale).

        Returns ``(a_gain, b_gain)`` — or, for vent-gated buildings,
        ``(a_gain, b_gain, a_vent, b_vent, vent_thr)`` with the
        ventilation channel routed through the kernel's in-run gate rows
        (weather-only outdoor/wind gates applied here from the per-step
        mean outdoor conditions, matching engine.step.apply_vent_gates;
        the indoor gates run in-kernel from the carry zone T)."""
        import jax.numpy as jnp
        import numpy as np

        from heatx.constants import KELVIN
        from heatx.physics import gas as gas_mod

        b = self._tm.building
        Z = b.n_zones
        dt = self._dtype
        gate = self._bb.vent is not None

        # Built ONCE and cached: a fresh jitted closure per call re-traces
        # the [T, Z] scatter graph every run (~0.8 s/call at annual 10k
        # scale — it dominated FastRunner's gap to the raw kernel).
        if getattr(self, "_gains_jit", None) is not None:
            return self._gains_jit(
                inputs_seq.hvac_power, inputs_seq.lum_power,
                inputs_seq.inf_vol, inputs_seq.inf_temp, inputs_seq.inf_mask,
                inputs_seq.vent_vol, inputs_seq.vent_temp, inputs_seq.vent_mask,
                inputs_seq.t_out, inputs_seq.wind_speed,
                T_steps=T_steps,
            )

        def seq2(v, n, T_steps):
            a = jnp.asarray(v, dt)
            if a.ndim < 2:
                a = jnp.broadcast_to(a, (T_steps, n))
            return a

        @partial(jax.jit, static_argnames=("T_steps",))
        def gains(hvac, lum, inf_vol, inf_temp, inf_mask, vent_vol, vent_temp,
                  vent_mask, t_out, wind, T_steps):
            a_gain = jnp.zeros((T_steps, Z), dt)
            if b.hvac_pair_unit.size:
                hv = seq2(hvac, b.n_hvacs, T_steps)
                a_gain = a_gain.at[:, np.asarray(b.hvac_pair_space)].add(
                    hv[:, np.asarray(b.hvac_pair_unit)]
                )
            if b.lum_space.size:
                a_gain = a_gain.at[:, np.asarray(b.lum_space)].add(
                    seq2(lum, b.n_luminaires, T_steps)
                )
            b_gain = jnp.zeros((T_steps, Z), dt)
            vent_out = ()
            for kind, vol, temp, mask in [
                ("inf", inf_vol, inf_temp, inf_mask),
                ("vent", vent_vol, vent_temp, vent_mask),
            ]:
                vol = seq2(vol, Z, T_steps)
                temp = seq2(temp, Z, T_steps)
                mask = seq2(mask, Z, T_steps)
                t_k = temp + KELVIN
                term = jnp.where(
                    mask > 0,
                    gas_mod.density(gas_mod.AIR, t_k)
                    * vol
                    * gas_mod.heat_capacity(gas_mod.AIR, t_k),
                    0.0,
                )
                # Masked product (NaN-safe), matching zone.air_exchange.
                if kind == "vent" and gate:
                    # Per-step mean outdoor conditions ([T] hourly scalars
                    # or [T, sub] per-sub-step series).
                    def mean1(v):
                        v = jnp.asarray(v, dt)
                        v = jnp.broadcast_to(v, (T_steps,) + v.shape[1:])
                        return v if v.ndim == 1 else jnp.mean(v, axis=1)

                    tm_ = mean1(t_out)[:, None]
                    wm_ = mean1(wind)[:, None]
                    out_ok = (
                        (tm_ > jnp.asarray(b.vent_min_tout, dt)[None])
                        & (tm_ < jnp.asarray(b.vent_max_tout, dt)[None])
                        & (wm_ < jnp.asarray(b.vent_max_wind, dt)[None])
                    )
                    a_v = jnp.where((mask > 0) & out_ok, term * temp, 0.0)
                    b_v = jnp.where(out_ok, term, 0.0)
                    thr = jnp.asarray(b.vent_delta, dt)[None] + tm_
                    vent_out = (a_v, b_v, jnp.broadcast_to(thr, (T_steps, Z)))
                else:
                    a_gain = a_gain + jnp.where(mask > 0, term * temp, 0.0)
                    b_gain = b_gain + term
            return (a_gain, b_gain) + vent_out

        self._gains_jit = gains
        return gains(
            inputs_seq.hvac_power, inputs_seq.lum_power,
            inputs_seq.inf_vol, inputs_seq.inf_temp, inputs_seq.inf_mask,
            inputs_seq.vent_vol, inputs_seq.vent_temp, inputs_seq.vent_mask,
            inputs_seq.t_out, inputs_seq.wind_speed,
            T_steps=T_steps,
        )

    def _weather_xs(self, v, T_steps, interp_weather):
        """[T] scalar weather series -> [D, hours*sub] kernel rows (O(T*sub)
        host work, negligible).  Factored from run() so chunk_grad's
        backward prep is the SAME transform."""
        import numpy as np

        j = self._jnp
        sub = self._substeps
        H = self._hours
        a = np.broadcast_to(np.asarray(v, np.float64), (T_steps,))
        if interp_weather:
            from heatx.weather.epw import interpolate_to_steps

            s = interpolate_to_steps(a, sub)[: T_steps * sub]
        else:
            s = np.repeat(a, sub)
        return j.asarray(s.reshape(T_steps // H, H * sub), self._dtype)

    def _ensure_chunk_prep(self):
        """Build the jitted per-chunk operand blocker (shared by run() and
        chunk_grad's backward prep).

        ALL the per-chunk blockers (irradiance, gains, vent gates, setpoint
        and shade schedules) fuse into ONE jitted call per dispatch chunk —
        each separate jitted call costs a host round trip, and at
        small-model scale (the 3-zone office year: 12 monthly chunks x
        up to 7 prep calls) the round trips dominated the wall clock.
        The host-numpy permutation alternative was O(T x S) per call and
        would dominate wall-clock for annual runs at 10k+ surfaces."""
        if getattr(self, "_chunk_prep_jit", None) is not None:
            return
        j = self._jnp
        b = self._tm.building
        bb = self._bb
        H = self._hours
        SP = bb.layout.padded_surfaces
        NB, ZB = bb.n_blocks, bb.zones_per_block
        dt = self._dtype
        idx = self._layout_idx()
        perm_c, perm_ok = idx.perm_c, idx.perm_ok
        zt_c, zt_ok = idx.zt_c, idx.zt_ok
        S_real = b.n_surfaces
        Z_real = b.n_zones

        def chunk_prep(surf_raw, gains_raw, vent_c, sp_c, shade_c,
                       T_steps, is_ts):
            # ``is_ts`` is the per-channel time-leading classification,
            # decided ONCE over the FULL horizon (never re-derived from
            # the chunk length: a [T] series sliced to a chunk whose
            # length equals n_surfaces would otherwise be silently
            # reinterpreted as a per-surface map).
            def surf_xs(v, ts):
                v = j.asarray(v, dt)
                if ts and v.ndim == 1:
                    v = v[:, None]  # [chunkT] hourly scalar series
                elif not ts:
                    if v.ndim == 0:
                        v = j.broadcast_to(v, (1, 1))
                    else:  # [S] static per-surface map
                        v = j.broadcast_to(v, (1, S_real))
                v = j.broadcast_to(v, (T_steps, S_real))
                blocked = j.where(perm_ok[None, :], v[:, perm_c], 0.0)
                return blocked.reshape(T_steps // H, H, SP)

            def zone_xs(a):
                out = j.where(zt_ok[None], a[:, zt_c], 0.0)
                return out.reshape(T_steps // H, H, NB, ZB)

            def zone_rows(a):  # [chunkT, Z], [chunkT, 1] or [Z]
                a = j.broadcast_to(j.asarray(a, dt), (T_steps, Z_real))
                return zone_xs(a)

            def shade_rows(a):  # [chunkT, S] or [S]
                a = j.broadcast_to(j.asarray(a, dt), (T_steps, S_real))
                out = j.where(perm_ok[None, :], a[:, perm_c], 1e9)
                return out.reshape(T_steps // H, H, SP)

            a_gain, b_gain = gains_raw
            return (
                tuple(surf_xs(v, ts) for v, ts in zip(surf_raw, is_ts))
                + (zone_xs(a_gain), zone_xs(b_gain))
                + tuple(zone_xs(j.asarray(v, dt)) for v in vent_c)
                + tuple(zone_rows(v) for v in sp_c)
                + tuple(shade_rows(v) for v in shade_c)
            )

        self._chunk_prep_jit = jax.jit(
            chunk_prep, static_argnames=("T_steps", "is_ts")
        )

    def run(
        self,
        state: SimState,
        inputs_seq: StepInputs,
        collect_zone_T: bool = True,
        assert_finite: bool = True,
        interp_weather: bool = False,
        dispatch_days: int = None,
        collect_fluxes: bool = False,
        collect_loads: bool = False,
        ground_hourly=None,
        collect_operative: bool = False,
    ):
        """March a whole [T, ...] input sequence through the fused kernel:
        the fast-path equivalent of :meth:`ThermalModel.run`.

        ``assert_finite`` (default on) reads the kernel's in-kernel per-hour
        non-finite state count — one masked reduce over every node and zone
        temperature at each hour boundary (the fused-path analogue of the
        reference's per-sub-step NaN asserts, model.rs:416-419) — and raises
        :class:`FloatingPointError` naming the first bad hour and block.
        For LARGE workloads (a dispatch chunk covering at least
        ``heatx.api.DEFER_CHECK_SURFACE_HOURS`` surface-hours, 1e7 by
        default) the check runs per dispatch chunk with a one-chunk lag,
        so a divergent annual run fails within days of the blow-up instead
        of marching 8760 h of garbage.  Below that threshold the whole run
        computes faster than one host sync, so the per-chunk counts
        accumulate and ONE end-of-run reduction checks them — the raised
        error still names the first bad hour and block either way.

        ``dispatch_days`` splits the sequence into chunks of that many
        kernel invocations per device dispatch (None = one dispatch for the
        whole sequence).  Chunking also bounds single-call run time under
        remote-runtime watchdogs; dispatches queue asynchronously, so there
        is no pipeline bubble beyond the per-chunk finiteness sync.

        ``collect_fluxes`` returns the per-hour h/q history — the
        reference's observable per-surface state channels
        (surface_trait.rs:223-354) — as a dict of [T, S] arrays
        (``h_front``, ``h_back``, ``q_front``, ``q_back``).  Requires the
        runner to be constructed with ``collect_fluxes=True``.

        ``interp_weather`` linearly interpolates per-hour scalar weather
        (t_out / wind) to the kernel's sub-steps instead of holding it
        constant within the hour — the reference re-queries weather every
        sub-step (model.rs:371-374); hourly series are all an EPW offers, so
        interpolation is the faithful rendering.  Only applies to [T]-shaped
        scalar weather leaves.

        ``inputs_seq`` leaves carry a leading [T] hour axis (weather may be
        [T] scalars-per-hour; per-surface irradiance [T, S], [S] or scalar;
        gains [T, n] or [n]).  T must divide evenly into the runner's
        ``hours`` chunk (pad the sequence or construct the runner with
        ``hours=1``).
        ``collect_loads`` (setpoint-driven HVAC only) appends the [T, Z]
        per-hour mean ideal-load powers (the heating/cooling demand series,
        computed in-kernel; see heatx.engine.zone.zone_update).

        ``ground_hourly`` ([T] C) drives ground-contact faces from a
        per-hour soil-temperature series (EPW monthly ground temperatures,
        ``heatx.weather.epw.monthly_to_hourly``): the value must be
        constant within each ``hours`` kernel chunk (months are whole days,
        so any daily-or-coarser series works with hours=24), and the
        dispatch loop splits at value changes and swaps the kernel's
        boundary-temperature operands between dispatches — no
        recompilation.

        ``collect_operative`` appends the [T, Z] per-hour operative
        temperature ``(T_air + T_mrt)/2`` (Carroll zone MRT solved in-kernel
        from each hour's final state — ThermalModel.run(collect_operative)
        at kernel speed).  Requires the runner to be constructed with
        ``collect_operative=True``.

        Returns ``(final SimState, zone_T [T, Z] | None)``, with
        ``collect_fluxes`` appending the fluxes dict, ``collect_loads``
        the loads array, and ``collect_operative`` the operative series
        (in that order).
        """
        import numpy as np

        if collect_fluxes and not self._collect_hq:
            raise ValueError(
                "construct the runner with collect_fluxes=True to collect "
                "the h/q history"
            )
        if collect_operative and not self._collect_op:
            raise ValueError(
                "construct the runner with collect_operative=True to "
                "collect the operative-temperature history"
            )

        j = self._jnp
        b = self._tm.building
        bb = self._bb
        lay = bb.layout
        H = self._hours
        sub = self._substeps
        SP = lay.padded_surfaces
        NB, ZB = bb.n_blocks, bb.zones_per_block
        dt = self._dtype

        has_sched = (
            inputs_seq.heat_sp is not None or inputs_seq.cool_sp is not None
        )
        if has_sched and not self._scheduled_sp:
            raise ValueError(
                "construct the runner with scheduled_setpoints=True to pass "
                "StepInputs.heat_sp/cool_sp schedules through the kernel"
            )
        if has_sched:
            _check_setpoint_order(b, inputs_seq.heat_sp, inputs_seq.cool_sp)
        t_out = np.asarray(inputs_seq.t_out, np.float64)
        T_steps = t_out.shape[0]
        if T_steps % H != 0:
            raise ValueError(
                f"sequence length {T_steps} not divisible by the runner's "
                f"hours={H} chunk; pad the sequence or use hours=1"
            )
        D = T_steps // H

        def weather(v):
            return self._weather_xs(v, T_steps, interp_weather)

        # Per-surface irradiance and zone gains prep runs ON DEVICE (jitted
        # gathers): see _ensure_chunk_prep.
        self._ensure_chunk_prep()

        gains_all = self._gains_dev(inputs_seq, T_steps)
        a_gain, b_gain = gains_all[:2]
        vent_seq = gains_all[2:] if len(gains_all) > 2 else None
        w_xs = (
            weather(inputs_seq.t_out),
            weather(inputs_seq.wind_speed),
            weather(inputs_seq.wind_direction),
        )
        # Per-surface channels are blocked PER DISPATCH CHUNK, not for the
        # whole horizon: four blocked [T, SP] buffers for an annual 100k-
        # surface run are ~14 GB and exhaust HBM (the raw inputs + one
        # chunk's blocked copies fit fine).  Channels without a leading
        # time axis pass through and broadcast inside the jitted prep.
        surf_raw = (
            inputs_seq.sol_front,
            inputs_seq.sol_back,
            inputs_seq.ir_front,
            inputs_seq.ir_back,
        )
        S_real = b.n_surfaces

        def time_leading(v):
            # Same reading as the XLA path (ThermalModel.inputs_sequence):
            # a leading axis of length T is a per-step series, and on the
            # T == n_surfaces ambiguity the time-series reading WINS — pass
            # [1, S] to force a static per-surface map in that case.
            sh = np.shape(v)  # shape only — no device transfer
            if len(sh) == 2 and sh[0] == T_steps:
                return True
            return len(sh) == 1 and sh[0] == T_steps

        surf_is_ts = tuple(time_leading(v) for v in surf_raw)
        surf_raw = tuple(j.asarray(v, dt) for v in surf_raw)

        sp_full = None
        if self._scheduled_sp:
            # Setpoint schedules: constants stay in their compact [Z] form
            # (broadcast per dispatch chunk inside the jitted blocker — no
            # full-horizon [T, Z] buffer); time series normalize to [T, Z]
            # or [T, 1].  Same time-vs-zone reading as the XLA paths
            # (step._with_time_axis_mix): a 1-D length-T array is a
            # per-step scalar schedule.
            Z = b.n_zones

            def sp_series(v, compiled):
                """-> ("ts", [T, Z|1]) or ("const", [Z])."""
                if v is None:
                    return ("const", j.asarray(compiled, dt))
                sh = np.shape(v)
                if len(sh) == 1 and sh[0] == T_steps:
                    return ("ts", j.asarray(v, dt)[:, None])
                if len(sh) <= 1:  # scalar or [Z] constant
                    return ("const", j.broadcast_to(j.asarray(v, dt), (Z,)))
                if sh[0] == T_steps:
                    return ("ts", j.asarray(v, dt))
                if sh[0] == 1:  # [1, Z] constant with explicit time axis
                    return ("const", j.asarray(v, dt)[0])
                raise ValueError(
                    f"setpoint schedule shape {sh} not understood: pass "
                    f"scalar, [Z], [T], [1, Z], or [T, Z] (T={T_steps}, Z={Z})"
                )

            sp_full = (
                sp_series(inputs_seq.heat_sp, b.ctl_heat_sp),
                sp_series(inputs_seq.cool_sp, b.ctl_cool_sp),
            )

        if inputs_seq.shade_sp is not None and not self._scheduled_shade:
            raise ValueError(
                "StepInputs.shade_sp requires in-run zone-shading controls "
                "(BuildingModel.add_zone_shading)"
            )
        shade_full = None
        if self._scheduled_shade:
            # Zone-shading setpoint series: [S] constants stay compact
            # (broadcast per chunk inside the jitted blocker); [T, S]
            # schedules slice per chunk.  Defaults to the compiled per-pane
            # setpoints (schedule AND-gates pass +1e9 on blocked hours,
            # engine.step.apply_zone_shading semantics).
            sv = inputs_seq.shade_sp
            if sv is None:
                shade_full = ("const", j.asarray(b.shade_sp, dt))
            else:
                sh = np.shape(sv)
                if len(sh) == 2 and sh[0] == T_steps:
                    shade_full = ("ts", j.asarray(sv, dt))
                elif len(sh) <= 1:
                    shade_full = (
                        "const",
                        j.broadcast_to(j.asarray(sv, dt), (S_real,)),
                    )
                else:
                    raise ValueError(
                        f"shade_sp schedule shape {sh} not understood: pass "
                        f"scalar, [S], or [T, S] (T={T_steps}, S={S_real})"
                    )

        def chunk_xs(d0, n_days):
            sl = slice(d0 * H, (d0 + n_days) * H)
            raw_c = tuple(
                v[sl] if ts else v for v, ts in zip(surf_raw, surf_is_ts)
            )
            vent_c = (
                tuple(v[sl] for v in vent_seq) if vent_seq is not None else ()
            )
            sp_c = (
                tuple(arr[sl] if kind == "ts" else arr for kind, arr in sp_full)
                if sp_full is not None
                else ()
            )
            shade_c = ()
            if shade_full is not None:
                kind, arr = shade_full
                shade_c = (arr[sl] if kind == "ts" else arr,)
            # One fused device call blocks every channel for the chunk.
            return tuple(w[d0 : d0 + n_days] for w in w_xs) + self._chunk_prep_jit(
                raw_c, (a_gain[sl], b_gain[sl]), vent_c, sp_c, shade_c,
                T_steps=n_days * H, is_ts=surf_is_ts,
            )

        if self._run_jit is None:
            hour_march = self._hour_march
            collect_hq = self._collect_hq
            collect_op = self._collect_op
            has_loads = getattr(self._hour_march, "collect_loads", False)

            def scan_run(params, T, zT, xs, collect):
                def body(carry, chunk):
                    T, zT, _ = carry
                    outs = hour_march(params, T, zT, chunk)
                    T, zT, hq, hist = outs[:4]
                    k = 4
                    hqh = None
                    if collect_hq:
                        hqh = outs[k]
                        k += 1
                    bad = outs[k]
                    k += 1
                    ld = None
                    if has_loads:
                        ld = outs[k]
                        k += 1
                    top = outs[k] if collect_op else None
                    return (T, zT, hq), (
                        hist if collect else None, hqh, bad, ld, top
                    )

                hq0 = tuple(j.zeros((SP,), dt) for _ in range(4))
                (T, zT, hq), ys = jax.lax.scan(body, (T, zT, hq0), xs)
                return T, zT, hq, ys

            self._run_jit = jax.jit(scan_run, static_argnames=("collect",))

        has_loads = getattr(self._hour_march, "collect_loads", False)
        if collect_loads and not has_loads:
            raise ValueError(
                "collect_loads requires setpoint-driven HVAC "
                "(IdealHeaterCooler with heat_setpoint/cool_setpoint)"
            )
        Tb, zTb = self.to_blocked(state)
        # With a ground series the dispatch loop splits at value changes
        # anyway, so default to whole-horizon chunks: an annual run with
        # monthly soil temperatures becomes 12 dispatches of 3 distinct
        # scan lengths (28/30/31 days — 3 cheap wrapper traces over the
        # cached day kernel), not 365 per-day dispatches whose launch
        # latency dominates small models (was 17 s for a 3-zone year
        # through a remote tunnel; ~2 s month-chunked).
        if dispatch_days is None:
            chunk_D = D
        else:
            chunk_D = max(1, int(dispatch_days))
        gday = None
        if ground_hourly is not None:
            g = np.asarray(ground_hourly, np.float64)
            if g.shape != (T_steps,):
                raise ValueError(
                    f"ground_hourly must be [{T_steps}] (one value per hour), "
                    f"got {g.shape}"
                )
            gd = g.reshape(D, H)
            if not (gd == gd[:, :1]).all():
                raise ValueError(
                    f"ground_hourly must be constant within each {H}-hour "
                    "kernel chunk (use a daily-or-coarser series, or hours=1)"
                )
            gday = gd[:, 0]
        hists, hqhs, lds, tops = [], [], [], []
        hq = None

        def check_bad(d0, bad_c):
            # Device-side total first: the sum of a block-sharded array is
            # replicated, so this host sync works even on a multi-process
            # mesh where the per-block counts are not all addressable.
            if float(j.sum(bad_c)) <= 0:
                return
            try:
                bad_np = np.asarray(bad_c)  # [chunk, hours, NB]
                ci, hi, bi = (int(x) for x in np.argwhere(bad_np > 0)[0])
                hour = (d0 + ci) * H + hi
                detail = (
                    f"at hour {hour} (day {hour // 24}, block {bi}): "
                    f"{int(bad_np[ci, hi, bi])} bad values"
                )
            except RuntimeError:  # non-addressable shards (multi-process)
                detail = f"within days [{d0}, {d0 + int(bad_c.shape[0])})"
            raise FloatingPointError(
                f"non-finite state first detected {detail}"
            )

        pending = None  # one-chunk lag: check chunk i after dispatching i+1,
        # so the finiteness fetch overlaps the next chunk's execution instead
        # of serializing the dispatch pipeline.
        # For SMALL workloads the per-chunk host sync itself is the cost:
        # each float() is a device round trip, and a 3-zone year in 12
        # monthly dispatches computes in ~0.1 s total — fail-fast buys
        # nothing there.  Defer to one end-of-run reduction (a single
        # round trip; the per-chunk localization still runs on the rare
        # failure path) whenever a chunk's surface-hours are tiny.
        defer_check = (
            (min(chunk_D, D) * H) * b.n_surfaces < DEFER_CHECK_SURFACE_HOURS
        )
        deferred = []
        starts = set(range(0, D, chunk_D))
        if gday is not None:
            # Split dispatches at soil-temperature changes so each dispatch
            # sees one constant ground value.
            starts |= set(int(i) for i in np.flatnonzero(np.diff(gday)) + 1)
        starts = sorted(starts)
        for si, d0 in enumerate(starts):
            d1 = starts[si + 1] if si + 1 < len(starts) else D
            if gday is not None and (si == 0 or gday[d0] != gday[starts[si - 1]]):
                self.set_ground_temperature(float(gday[d0]))
            xs_c = chunk_xs(d0, d1 - d0)
            Tb, zTb, hq, (hist_c, hqh_c, bad_c, ld_c, top_c) = self._run_jit(
                self._params, Tb, zTb, xs_c, collect_zone_T
            )
            if assert_finite:
                if defer_check:
                    deferred.append((d0, bad_c))
                else:
                    if pending is not None:
                        check_bad(*pending)
                    pending = (d0, bad_c)
            if collect_zone_T:
                hists.append(hist_c)
            if collect_fluxes:
                hqhs.append(hqh_c)
            if collect_operative:
                tops.append(top_c)
            if has_loads:
                if collect_loads:
                    lds.append(ld_c)
                else:
                    # Only the last hour seeds final.ideal_load; retaining
                    # every chunk would hold the whole [T, NB, ZB] history
                    # on device for nothing.
                    lds = [ld_c]
        if pending is not None:
            check_bad(*pending)
        if deferred:
            # One fused total across every chunk (single host round trip);
            # localize per chunk only on the failure path.
            if getattr(self, "_badsum_jit", None) is None:
                self._badsum_jit = jax.jit(
                    lambda bs: sum(j.sum(x) for x in bs)
                )
            total = self._badsum_jit(tuple(bc for _, bc in deferred))
            if float(total) > 0:
                for d0, bc in deferred:
                    check_bad(d0, bc)
        final = self.from_blocked(Tb, zTb, hq)
        if has_loads:
            self._converters()  # ensure _zinv_d
            # Final state carries the last marched hour's mean ideal power.
            last = lds[-1][-1, -1].reshape(NB * ZB)[self._zinv_d]
            final = final._replace(ideal_load=last)

        zone_T = None
        if collect_zone_T:
            self._converters()  # ensure _zinv_d
            hist = j.concatenate(hists, axis=0).reshape(T_steps, NB * ZB)
            zone_T = hist[:, self._zinv_d]  # device gather, stays on device
        loads = None
        if collect_loads:
            self._converters()
            ld = j.concatenate(lds, axis=0).reshape(T_steps, NB * ZB)
            loads = ld[:, self._zinv_d]  # [T, Z] mean ideal power per hour
        operative = None
        if collect_operative:
            self._converters()
            top = j.concatenate(tops, axis=0).reshape(T_steps, NB * ZB)
            operative = top[:, self._zinv_d]  # [T, Z] post-hour operative T
        ret = (final, zone_T)
        if collect_fluxes:
            S = b.n_surfaces
            chans = []
            for k in range(4):
                a = np.concatenate(
                    [np.asarray(h[k]) for h in hqhs], axis=0
                ).reshape(T_steps, SP)
                chans.append(lay.surfaces_from_blocked(a, S))
            fluxes = dict(zip(("h_front", "h_back", "q_front", "q_back"), chans))
            ret = ret + (fluxes,)
        if collect_loads:
            ret = ret + (loads,)
        if collect_operative:
            ret = ret + (operative,)
        return ret

    def march_blocked(self, T, zT, hour_inputs):
        """One hour on blocked state (the zero-copy hot path).  Returns
        ``(T, zT, hq, zt_hist[, hq_hist], bad[, ld_hist][, top_hist])`` —
        the trailing entries follow the runner's collect flags (bad is
        always present; loads when the building has thermostats; the
        operative history when built with collect_operative)."""
        return self._jit(self._params, T, zT, hour_inputs)

    def march(self, state: SimState, inputs: StepInputs) -> SimState:
        """One main-step/hour: SimState in, SimState out (convenient, but
        converts through the host — use march_blocked for long runs)."""
        T, zT = self.to_blocked(state)
        outs = self.march_blocked(T, zT, self.hour_inputs(inputs))
        T, zT, hq = outs[0], outs[1], outs[2]
        st = self.from_blocked(T, zT, hq)
        if getattr(self._hour_march, "collect_loads", False):
            self._converters()  # ensure _zinv_d
            NB, ZB = self._bb.n_blocks, self._bb.zones_per_block
            # The loads history sits BEFORE the optional operative history
            # in the kernel outputs (make_hour_march output ordering).
            ld_out = outs[-2] if self._collect_op else outs[-1]
            ld = ld_out[-1].reshape(NB * ZB)[self._zinv_d]
            st = st._replace(ideal_load=ld)
        return st
