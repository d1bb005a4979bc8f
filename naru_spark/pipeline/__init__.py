"""LLM-data-pipeline operators (beyond the reference's surface, per the
north star): deduplication, similarity search, text analysis, multimodal
column plumbing. All Spark-first: built-in functions in the hot path,
Arrow-batched pandas UDFs only where built-ins can't express the op.
"""
