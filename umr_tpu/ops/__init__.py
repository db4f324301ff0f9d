from . import quaternion, projection, grid_sample  # noqa: F401
