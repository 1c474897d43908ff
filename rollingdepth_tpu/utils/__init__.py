from .presets import PRESETS, InferenceSettings, resolve_preset  # noqa: F401
