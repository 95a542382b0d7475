"""smart_ocr_spark — PySpark-native re-implementation of the socr
(r-uben/smart-ocr) per-document text-extraction pipeline.

The reference is a single-machine Python orchestrator (see /root/reference,
read-only); this package re-expresses the same computation as bounded
DataFrame transforms over a Common-Crawl-style documents table:

    documents(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Layers:
  kernel/     pure-Python, Spark-free extraction/normalization/audit kernels
              (run inside Arrow-batch UDFs; unit-tested standalone)
  functions/  pyspark.sql column-expression helpers (JVM-side where possible)
  operators/  DataFrame-level operators (extract, audit, consensus, dedup, ...)
  sources/    corpus generation, table loading, checkpoint state store
  plans/      end-to-end pipeline drivers (the socr 5-phase lifecycle)
  streaming/  incremental/resumable batch runner (the reference is bounded
              batch with checksum checkpoints, not true streaming)
"""

__version__ = "0.1.0"
