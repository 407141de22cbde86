"""Named query registry — the judged operator inventory.

Importing this package registers every query module; ``QUERIES`` maps
name → Callable[(SparkSession, sf_dir), DataFrame] and ``ORACLES`` maps
name → equivalent ANSI SQL for the DuckDB oracle.
"""

from .registry import ORACLES, QUERIES, register  # noqa: F401

# Import for side effect: each module registers its queries.
from . import core  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import cdc_scd2  # noqa: E402,F401
from . import config_driven  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import tpch_shapes  # noqa: E402,F401
from . import tpch_full  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import dedup_advanced  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import llm_extras  # noqa: E402,F401
from . import intervals  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
