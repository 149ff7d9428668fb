"""multi_crm_cross_sell_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-imagination of the query and data-processing
capabilities of the reference repo Andre-Profitt/multi-crm-cross-sell
(multi-CRM cross-sell intelligence: ETL, feature engineering, candidate
generation, ensemble scoring, entity resolution, ranking evaluation,
feedback analytics), plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Everything is expressed as declarative DataFrame/SQL plans so Catalyst
can push filters/projections to the parquet scan, pick join strategies
(broadcast for dims), and re-plan at runtime with AQE. Python UDFs are
confined to the few genuinely non-expressible kernels (Jaro-Winkler),
always as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
