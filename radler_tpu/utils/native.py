"""Loader for optional native (C++) host-side helpers.

When ``native/`` has been built (see ``native/Makefile``), this module exposes
ctypes bindings; importing it raises ImportError otherwise so callers fall
back to the NumPy implementations.
"""
raise ImportError("native helpers not built")
