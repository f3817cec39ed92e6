"""orders_kafka_streams_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query & data-processing
capabilities of the reference stream processor
``dhoard/orders-kafka-streams`` (a Kafka Streams pair-match →
windowed-aggregate pipeline), re-expressed Spark-first:

- batch + streaming share one set of DataFrame-native operator
  definitions (``operators/``, ``streaming/``);
- sources are abstracted (``sources/``): parquet tables for tests,
  Kafka + JSON edge codecs for production streams;
- the extension surface adds LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) designed
  for 100 TB scale.

See SURVEY.md §2 for the operator inventory this package implements.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
