"""ctypes loader for the native CIDEr-D scorer (builds on first use)."""

from .build import load_library  # noqa: F401
