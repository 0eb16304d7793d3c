"""Validation: series comparison, HTML reports, EnergyPlus fixture replay."""

from heatx.validate.series import SeriesValidation, Validator  # noqa: F401
