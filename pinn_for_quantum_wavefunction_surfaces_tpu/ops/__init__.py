from . import fwdlap, operators, sampling  # noqa: F401
