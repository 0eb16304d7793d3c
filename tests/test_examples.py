"""Every example under examples/ runs in-process on smoke settings.

Each script honors ``HEATX_EXAMPLE_FAST=1`` (tiny horizons / member counts /
iteration budgets) so the whole gallery executes in CI: any API drift in the
examples breaks the suite instead of rotting silently.  The scripts' own
terminal asserts (finite outputs, recovered parameters, demand > 0) run as
part of ``main()``; scale-dependent claims are gated on the full settings
inside the scripts themselves.
"""

import importlib.util
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
EPW = os.environ.get(
    "HEATX_EPW", "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"
)

SCRIPTS = sorted(
    f[:-3]
    for f in os.listdir(EXAMPLES_DIR)
    if f.endswith(".py") and not f.startswith("_")
)

# Scripts that hard-require the reference EPW fixture (the rest synthesize
# weather when it is absent).
NEEDS_EPW = {"office_idf", "size_equipment", "passive_controls", "comfort"}


def _run_example(name, monkeypatch):
    monkeypatch.setenv("HEATX_EXAMPLE_FAST", "1")
    monkeypatch.setattr(sys, "argv", [f"{name}.py"])
    path = os.path.join(EXAMPLES_DIR, f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"example_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main()
    assert rc in (None, 0), f"{name}.main() returned {rc}"


@pytest.mark.parametrize("name", SCRIPTS)
def test_example_runs(name, monkeypatch):
    if name in NEEDS_EPW and not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    _run_example(name, monkeypatch)


def test_all_examples_covered():
    """The gallery list matches the on-disk scripts (a new example without
    a smoke run would bypass this suite silently)."""
    assert len(SCRIPTS) == 11, SCRIPTS
