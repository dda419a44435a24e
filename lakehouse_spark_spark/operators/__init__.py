"""Operator library public API.

Each module groups one operator family; the names re-exported here are
the stable surface a pipeline author composes (see plans/pipeline.py
and plans/queries.py for canonical usage).
"""

from lakehouse_spark_spark.operators.cleaning import null_to_sentinel, recompute_money, typed_cast  # noqa: F401
from lakehouse_spark_spark.operators.dedup import content_hash, dedup_latest, exact_dedup  # noqa: F401
from lakehouse_spark_spark.operators.dimensions import build_dim_date, build_dimension  # noqa: F401
from lakehouse_spark_spark.operators.dq import DQCheck, duplicate_rate, null_rate, orphan_rate_df, run_checks  # noqa: F401
from lakehouse_spark_spark.operators.facts import fk_stamp, orphan_audit, orphan_drop  # noqa: F401
from lakehouse_spark_spark.operators.skew import add_salt, explode_salts, salted_join  # noqa: F401
from lakehouse_spark_spark.operators.temporal import asof_join, banded_range_join  # noqa: F401
from lakehouse_spark_spark.operators.windows import hourly_type_stats, session_stats, sessionize, tumbling_agg  # noqa: F401
