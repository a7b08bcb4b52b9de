"""Runtime layer: named presets for every published reference config and
the CLI driver producing the reference's result-bundle layout."""

from .presets import PRESETS, Preset, get_preset

__all__ = ["PRESETS", "Preset", "get_preset"]
