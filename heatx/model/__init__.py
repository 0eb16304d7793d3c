"""Building data model (the subset of SIMPLE's simple_model that heat uses)."""

from heatx.model import building, geometry  # noqa: F401
