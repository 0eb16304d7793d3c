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

from typing import Optional, Tuple

import jax

from heatx.config import DEFAULT_CONFIG, SimConfig
from heatx.build.layout import CompiledBuilding, compile_building
from heatx.engine import step as step_mod
from heatx.engine.state import SimState, StepInputs, default_inputs, initial_state
from heatx.model.building import BuildingModel


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
        self._run = None
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

    # -- marching ------------------------------------------------------------

    def march(self, state: SimState, inputs: StepInputs) -> SimState:
        """One main timestep (= dt_subdivisions sub-steps), jit-compiled."""
        if self._march is None:
            self._march = step_mod.make_march_fn(self._device(), donate=False)
        return self._march(state, inputs)

    def run(
        self, state: SimState, inputs_seq: StepInputs, collect_zone_T: bool = True
    ) -> Tuple[SimState, Optional[jax.Array]]:
        """March a whole [T, ...] input sequence in one compiled scan."""
        if self._run is None:
            self._run = step_mod.make_run_fn(
                self._device(), collect_zone_T=collect_zone_T, donate=False
            )
        return self._run(state, inputs_seq)
