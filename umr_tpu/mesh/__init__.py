from .icosphere import create_sphere  # noqa: F401
from .symmetry import make_symmetric, make_faces_symmetric, symmetrize_np  # noqa: F401
from .uv import compute_uvsampler, get_spherical_coords  # noqa: F401
from .template import MeshTemplate, build_template  # noqa: F401
