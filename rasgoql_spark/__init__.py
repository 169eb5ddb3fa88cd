"""rasgoql_spark — a PySpark-native analytics engine with the transform
surface of rasgointelligence/RasgoQL, re-imagined Spark-first.

Quick start (mirrors reference README.md:100-118)::

    import rasgoql_spark as rql
    session = rql.connect(data_dir="/root/testdata/sf0.001")
    ds = session.dataset("lineitem")
    out = (
        ds.datetrunc(dates={"l_shipdate": "week"})
          .aggregate(group_by=["l_partkey", "L_SHIPDATE_WEEK"],
                     aggregations={"l_extendedprice": ["SUM"]})
    )
    out.preview()   # pandas, 10 rows
    out.sql()       # rendered Spark-SQL CTE chain
    out.to_df()     # full pandas result

Execution is always the composed DataFrame plan (Catalyst/Tungsten);
``.sql()`` text is a parity artifact for inspection and dbt export.
"""

from .dataset import Dataset, SQLChain
from .errors import (
    ParameterException,
    RasgoQLException,
    SQLException,
    TableAccessError,
    TableConflictException,
    TransformRenderingException,
)
from .registry import spark_transform, renderer, list_transforms, get_transform
from .session import RasgoSession, connect, default_spark

# reusable index artifacts (build once, dedup/search many batches)
from .functions.bloom import (BloomIndex, bloom_index, load_bloom_index,
                              save_bloom_index, update_bloom_index)
from .functions.dedup import (MinHashIndex, load_minhash_index, minhash_index,
                              minhash_tune, save_minhash_index,
                              update_minhash_index)
from .functions.similarity import IVFIndex, ivf_index
from .streaming.ops import stream_dedup_against, stream_embedding_join

__version__ = "0.1.0"

__all__ = [
    "connect",
    "default_spark",
    "RasgoSession",
    "Dataset",
    "SQLChain",
    "spark_transform",
    "renderer",
    "list_transforms",
    "get_transform",
    "RasgoQLException",
    "ParameterException",
    "TableAccessError",
    "TableConflictException",
    "SQLException",
    "TransformRenderingException",
    "BloomIndex",
    "bloom_index",
    "save_bloom_index",
    "load_bloom_index",
    "MinHashIndex",
    "stream_dedup_against",
    "stream_embedding_join",
    "update_minhash_index",
    "minhash_tune",
    "update_bloom_index",
    "minhash_index",
    "save_minhash_index",
    "load_minhash_index",
    "IVFIndex",
    "ivf_index",
    "__version__",
]
