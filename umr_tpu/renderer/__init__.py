from .soft_renderer import SoftRenderer, render_mesh, surface_normals  # noqa: F401
