from dp3_spark.operators.asof import dp3_asof_join
from dp3_spark.operators.merge import ordered_merge

__all__ = ["dp3_asof_join", "ordered_merge"]
