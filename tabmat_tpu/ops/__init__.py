from . import dense_ops  # noqa: F401
from . import segments  # noqa: F401
from .diag import DiagonalResult  # noqa: F401
