"""nexus_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference geospatial tile-analytics platform (dataplumber/nexus, surveyed in
SURVEY.md), re-expressed Spark-first:

- the primary abstraction is a long-format ``observations`` DataFrame
  ``(dataset, time, lat, lon, value, meta)`` — the relational form of the
  reference's tile model (reference: data-access/nexustiles/model/nexusmodel.py);
- every reference algorithm is a declarative DataFrame/SQL plan (groupBy /
  window / join) so Catalyst + Tungsten pick the physical strategy;
- masked cells are SQL ``NULL`` (Spark aggregates are null-skipping, matching
  ``np.ma`` semantics);
- beyond the reference surface, first-class large-scale training-data-pipeline
  operators: dedup, similarity search, text analysis, multimodal columns.

Designed for a multi-executor cluster at 100 TB scale (partition pruning,
broadcast joins for dims, no driver-side collects in the data path); tested on
local mode.
"""

__version__ = "0.1.0"

from nexus_spark.session import get_session  # noqa: F401
from nexus_spark.catalog import load_tables, register_views  # noqa: F401


def capabilities() -> list[dict]:
    """Enumerate the query surface (reference /capabilities analog,
    algorithms/Capabilities.py:12-43): every registered query, whether it
    is oracle-checked, and its implementing callable."""
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    return [
        {
            "name": name,
            "oracle_checked": name in oracles,
            "callable": f"{fn.__module__}.{fn.__name__}",
        }
        for name, fn in sorted(qs.items())
    ]
