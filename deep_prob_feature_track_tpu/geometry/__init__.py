from . import lie, warp  # noqa: F401
