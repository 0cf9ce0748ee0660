from . import energy  # noqa: F401
