from . import engine, losses  # noqa: F401
