"""redix_stream_spark — a PySpark-native stream-analytics engine.

Re-expresses the semantics of the reference stream processor
(hayesgm/redix_stream: append-only named logs, ordered per-message handler
application, consumer groups with at-least-once ack and crash-resume —
see /root/reference/lib/redix/stream/consumer.ex) on Apache Spark:

- Structured Streaming checkpoints play offsets / ack / restart
  (reference consumer.ex:130-281).
- ``foreachBatch`` plays side-effecting handlers (reference consumer.ex:283-299).
- A DataFrame/Catalyst relational layer (SURVEY.md §2.2) provides the
  analytics surface the reference delegates to its callers, plus
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) designed for 100 TB scale.

Package map:
- ``session``   — SparkSession builder with scale-tuned defaults.
- ``catalog``   — table loading / temp-view registration for a scale-factor dir.
- ``numeric``   — decimal-exact aggregation helpers (oracle bit-parity).
- ``operators`` — relational + window + stream-semantics batch operators.
- ``llm``       — dedup / similarity / text-analysis / multimodal operators.
- ``streaming`` — produce / Consumer / consumer groups on Structured Streaming.
- ``sources``   — custom Python DataSource serving an append-only event log.
- ``registry``  — the (queries, oracle_sql) contract consumed by __spark_entry__.
"""

__version__ = "0.1.0"
