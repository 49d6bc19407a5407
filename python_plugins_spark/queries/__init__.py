"""The engine's query registry — the driver-facing contract.

Split into per-section modules; importing this package populates
QUERIES/ORACLES in the same order as the former monolithic
queries.py. See _core for the registration helper and the
engine-portability conventions every oracle follows.
"""

from python_plugins_spark.queries._core import (  # noqa: F401
    BENCH_QUERIES,
    ORACLES,
    QUERIES,
    register,
    _global_index_part,
    _ts,
    _STRF,
)

# Imported for their registration side effects, in the monolith's
# original order (dict order is part of the driver-facing surface).
from python_plugins_spark.queries import core_relational  # noqa: F401,E402
from python_plugins_spark.queries import sources_sinks  # noqa: F401,E402
from python_plugins_spark.queries import subqueries_udf  # noqa: F401,E402
from python_plugins_spark.queries import tpch_deep  # noqa: F401,E402
from python_plugins_spark.queries import sql_training  # noqa: F401,E402
from python_plugins_spark.queries import corpus_sql4  # noqa: F401,E402
from python_plugins_spark.queries import warehouse  # noqa: F401,E402
from python_plugins_spark.queries import graph_diag  # noqa: F401,E402
from python_plugins_spark.queries import suites  # noqa: F401,E402
from python_plugins_spark.queries import lm_mining  # noqa: F401,E402


# Driver contract accessors (the __spark_entry__ surface)
def queries():
    return dict(QUERIES)


def oracle_sql():
    return dict(ORACLES)
