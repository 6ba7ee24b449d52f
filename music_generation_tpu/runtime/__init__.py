"""Native (C++) runtime components, loaded via ctypes."""

from .native_loader import maximum_path_native, native_available

__all__ = ["maximum_path_native", "native_available"]
