"""LLM-data-pipeline operators extending the FuseRank surface
(build brief): deduplication, similarity search, text analysis,
multimodal column plumbing — all Spark-first, each with an oracle
query entry where SQL-expressible."""
