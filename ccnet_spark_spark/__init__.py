"""ccnet_spark_spark — a from-scratch, PySpark-native quality-filtering
engine for web-scale image+caption tables.

Re-expresses the query/data-processing capabilities of the reference
(chukonu-team/ccnet_spark, a cc_net CommonCrawl cleaning pipeline) as an
idiomatic Spark DataFrame engine:

- input: a table of (image_id, bytes, w, h, fmt, caption, phash) pairs
  (Iceberg when the runtime jar is on the classpath; hive-partitioned
  parquet otherwise — same logical contract),
- caption quality pipeline: length heuristics -> line explode ->
  normalization -> line-hash dedup (keep / drop-all) -> doc regroup ->
  language ID -> tokenize -> perplexity -> head/middle/tail bucketing
  via broadcast cutoff tables -> PII/toxicity scrub -> keep/drop verdict,
- training-data ops: exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding-cosine dedup, brute-force + LSH ANN, language-ID heuristics,
  quality scoring, token counting, document fingerprinting,
- multimodal plumbing: binary image payloads carried byte-safely beside
  the text plan; decode/resize/feature stubs over mapInPandas.

Everything is DataFrame/Catalyst-first: built-in expressions in the hot
path, Arrow-vectorized pandas UDFs where Python is unavoidable, zero
per-row Python.
"""

__version__ = "0.1.0"
