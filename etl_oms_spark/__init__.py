"""etl_oms_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference project EliasGhennam/ETL_OMS (a pandas epidemic
ETL: heterogeneous CSV/JSON → long-format facts / star schema / Postgres
upsert warehouse), extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, multimodal columns, text analysis).

Everything is declared through the DataFrame API so Catalyst/Tungsten pick
the physical plan: predicate pushdown, column pruning, broadcast joins,
whole-stage codegen, AQE. Python UDFs are avoided on the hot path; where
Python is unavoidable (embeddings, multimodal decode) we use Arrow-batched
pandas UDFs / mapInPandas.

Module map
----------
- session        SparkSession factory with scale-aware defaults
- schema         canonical schemas, synonym maps, unit/disease maps
- reconcile      schema reconciliation (normalize/rename/complete/tag)
- transform      tolerant casts, date filters, lag-diff derivation, guards
- reshape        unpivot (melt) / pivot
- star           dimension + fact builders (star schema)
- merge          upsert/merge semantics (keep-last dedup, full-outer merge)
- sources.readers   CSV/JSON/parquet/directory scans, JDBC dim reads
- sources.writers   CSV/JSON/parquet sinks, JDBC staging+upsert sink
- operators.dedup        exact / minhash-LSH / simhash / n-gram-jaccard dedup
- operators.similarity   cosine top-k, LSH-bucketed ANN
- operators.text         language-ID, quality score, token count, fingerprints
- operators.multimodal   binary media columns: schema + mapInPandas plumbing
- streaming.events       event-time windowed aggregation, foreachBatch merge
- plans.pipelines        end-to-end pipelines mirroring the reference entry points
"""

__version__ = "0.1.0"
