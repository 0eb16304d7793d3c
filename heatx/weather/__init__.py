"""Weather inputs: EPW files and synthetic series."""

from heatx.weather.epw import EPWData, interpolate_to_steps, read_epw  # noqa: F401
