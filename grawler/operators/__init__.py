"""Large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) — first-class components alongside the
crawl engine; each has a queries()/oracle_sql() entry in __spark_entry__.py.
"""
