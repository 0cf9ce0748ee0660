from . import ansatz  # noqa: F401
