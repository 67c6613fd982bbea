"""Operator registry: every queries()/oracle_sql() entry lives here.

Importing this package pulls in all operator modules, each of which
registers its queries into ``REGISTRY`` via ``queries.register``.
"""

from .queries import REGISTRY, register  # noqa: F401
from . import queries  # noqa: F401
from . import textops  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import crawlq  # noqa: F401
from . import scoring  # noqa: F401
from . import temporal  # noqa: F401
from . import setops  # noqa: F401
from . import sketches_ops  # noqa: F401
from . import mlprep  # noqa: F401
from . import curation  # noqa: F401
from . import imageprep  # noqa: F401
from . import urlops  # noqa: F401
from . import graphops  # noqa: F401
from . import relops  # noqa: F401
from . import relops2  # noqa: F401
from . import relops3  # noqa: F401
from . import relops4  # noqa: F401
from . import textstats  # noqa: F401
from ..pipelines import reference_analogs  # noqa: F401
from ..pipelines import dashboards  # noqa: F401
