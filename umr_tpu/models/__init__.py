from .mesh_net import MeshNet, MeshNetS1  # noqa: F401
from .discriminator import Discriminator, gradient_reversal  # noqa: F401
from .lpips import LPIPSAlex  # noqa: F401
