"""Query plan registry. Importing this package registers all queries."""

from __future__ import annotations

from .base import REGISTRY, Query, register

from . import queries_relational  # noqa: E402,F401
from . import queries_scalar  # noqa: E402,F401
from . import queries_domain  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_curation  # noqa: E402,F401
from . import queries_vector  # noqa: E402,F401
from . import queries_morphology  # noqa: E402,F401
from . import queries_multimodal  # noqa: E402,F401
from . import queries_joins  # noqa: E402,F401
from . import queries_voxel  # noqa: E402,F401
from . import queries_window  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register"]
