from .agg import hll_ndv, hll_rollup, hll_sketch
from .functions import hll_cardinality_udf, hll_from_hex_udf, hll_to_hex_udf

__all__ = [
    "hll_ndv",
    "hll_sketch",
    "hll_rollup",
    "hll_cardinality_udf",
    "hll_from_hex_udf",
    "hll_to_hex_udf",
]
