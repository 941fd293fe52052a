"""fuserank_spark — PySpark-native rebuild of FuseRank
(ThecaSystems/multimodal-vector-search, ECML PKDD 2024).

A small library of composable DataFrame stages + a thin driver-side
query compiler. Everything data-plane is declarative (Catalyst
optimizes it); Python touches data only at the model-inference
boundary (Arrow-batched pandas UDFs).

Layout (SURVEY.md §7):
  session       SparkSession factory (Arrow + AQE on)
  schema        logical-type inference (P12-P14) + config dataclasses
  prep          cleaning ops P1-P11
  transforms    numeric distribution transforms Y1-Y5
  embed         text embedding X1-X4 (stub + pluggable HF path)
  encode        product-side encodings C1/C3/G1-G3/N1-N4/N8
  query         driver-side query compiler C2/C4/G4/N5-N7
  search        brute-force / batched top-k T1-T2
  rerank        windowed re-ranking W1-W8
  metrics       recall / r-precision A8
  index_export  per-partition FAISS shard export S4/S5
  pipeline_ext  LLM-data-pipeline ops: dedup, similarity, text stats,
                multimodal column plumbing
  streaming     Structured Streaming incremental corpus path
"""

__version__ = "0.1.0"

from .session import get_spark, load_tables  # noqa: E402,F401
from .schema import DatasetSchema, infer_aux_schema, with_row_id  # noqa: E402,F401
from .encode import compute_stats, encode_products, record_text_dim  # noqa: E402,F401
from .query import compile_query  # noqa: E402,F401
from .search import topk, topk_batch, text_topk_then_rerank  # noqa: E402,F401
from .rerank import rerank  # noqa: E402,F401
from .embed import DeterministicStubEmbedder, embed_corpus, embed_query  # noqa: E402,F401
from .metrics import r_precision, recall  # noqa: E402,F401
