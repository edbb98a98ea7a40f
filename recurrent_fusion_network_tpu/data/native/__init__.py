"""ctypes loader for the native feature-IO gather (builds on first use)."""

from .build import load_library  # noqa: F401
