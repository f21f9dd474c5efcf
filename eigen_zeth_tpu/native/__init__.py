"""Native (C++) runtime components + ctypes bindings."""
