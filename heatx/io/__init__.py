"""Fixture/file IO."""

from heatx.io.eplus import EPlusWallRun, read_eplusout  # noqa: F401
