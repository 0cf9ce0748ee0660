from . import checkpoint, modelbin, torch_pt  # noqa: F401
