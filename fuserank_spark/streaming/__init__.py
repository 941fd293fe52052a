"""Structured Streaming surface (SURVEY §2.11).

The reference has no streaming; the rebuild maps incremental corpus
growth onto Structured Streaming: new rows stream in, foreachBatch
runs the embed+encode stages, windowed aggregations maintain
freshness stats with watermarked late-data handling.
"""
