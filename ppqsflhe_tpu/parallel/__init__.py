from .mesh import make_mesh, client_sharding, limb_sharding  # noqa: F401
