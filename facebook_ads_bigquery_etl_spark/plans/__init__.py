"""Query plan library — the engine's user-facing query surface.

Every query is registered with (a) a Spark implementation (DataFrame
API or spark.sql — both compile through Catalyst) and (b) where
SQL-expressible, an ANSI-SQL oracle string that DuckDB runs on the
same parquet tables. The driver's correctness gate compares the two.
"""

from .registry import QUERIES, ORACLES, register, load_tables  # noqa: F401
from . import analytics  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import etl_parity  # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
from . import warehouse  # noqa: F401,E402
