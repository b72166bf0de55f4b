from .client import CommClient  # noqa: F401
from .server import ArtifactServer  # noqa: F401
