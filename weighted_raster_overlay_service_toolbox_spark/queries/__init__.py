"""Declared-query registry.

Every operator from SURVEY.md section 2.2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports this
registry to the driver.
"""

from .registry import QUERIES, ORACLES, query  # noqa: F401

# Import for side effect: each module registers its queries.
from . import aggregations  # noqa: F401,E402
from . import scans  # noqa: F401,E402
from . import projections  # noqa: F401,E402
from . import joins  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import sorts  # noqa: F401,E402
from . import setops  # noqa: F401,E402
from . import scalar_funcs  # noqa: F401,E402
from . import wro  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import extended  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLES", "query"]
