from .precision import Policy, DEFAULT_POLICY
from .mesh import make_mesh, MeshAxes

__all__ = ["Policy", "DEFAULT_POLICY", "make_mesh", "MeshAxes"]
