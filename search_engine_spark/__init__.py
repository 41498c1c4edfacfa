"""search_engine_spark — a PySpark-native inverted-index + TF-IDF/BM25 query engine.

A from-scratch Spark rebuild of the capabilities of the Go reference
``yuanyb/search-engine`` (see SURVEY.md): bigram tokenization, posting-list
construction with delta+varint compression, salted term partitioning,
multi-term conjunctive retrieval with phrase/title boosts, deterministic
top-k ranking — plus the large-scale training-data pipeline operators
(dedup, similarity search, text analysis) a 100 TB corpus needs.

Architecture is DataFrame-first: logical plans are declared with the
pyspark.sql API so Catalyst handles pushdown/pruning/join strategy; Python
only runs inside vectorized Arrow/pandas UDFs (tokenizer, codec, scorer).
"""

__version__ = "0.1.0"
