"""sparkcheck — a brand-new PySpark-native schema & constraint validation engine.

Re-expresses the validator catalog of the reference framework
(Schaafd/sql-testing-suite — pandas/SQLAlchemy, per-row Python loops) as
vectorized Spark SQL over huge tables:

- ``sparkcheck.rules``     — declarative rule IR (regex / range / length /
  null / enum / unique / custom / completeness / referential integrity),
  mirroring the semantics of ``sqltest/modules/field_validator/models.py``
  and ``sqltest/modules/business_rules/models.py`` in the reference.
- ``sparkcheck.compile``   — compiles rules into ``pyspark.sql.Column``
  predicates and fuses every per-column rule on a table into ONE
  ``df.agg(...)`` pass (the Spark-native replacement for the reference's
  per-row loops in ``field_validator/validator.py``).
- ``sparkcheck.profile``   — one-pass data profiler (null rates, min/max,
  mean/std, approx distinct, quantiles, histograms, top-k, pattern
  detection) — the Spark analog of ``modules/profiler``.
- ``sparkcheck.integrity`` — uniqueness / PK checks and referential-
  integrity anti-joins with broadcast + salting for skew.
- ``sparkcheck.drift``     — baseline profile store, delta comparison,
  PSI / KS drift statistics from histograms and binned CDFs.
- ``sparkcheck.run``       — driver-side scheduler (dependency DAG,
  severity gating, fail-fast) and per-partition checkpoint/resume.
- ``sparkcheck.io``        — sources (parquet/csv/json/inline/generated),
  YAML rule-config loader, violation & summary sinks.
- ``sparkcheck.textextract`` — deterministic html→text extraction
  (byte-identical contract) as an Arrow-vectorized pandas UDF.
- ``sparkcheck.webtext``   — deterministic synthetic Common-Crawl-style
  webtext table generator (url, warc_ts, html, text, lang).
- ``sparkcheck.datapipe``  — large-scale training-data pipeline ops:
  dedup (exact / minhash-LSH / simhash / n-gram jaccard / embedding
  cosine), ANN similarity search, language-ID, quality scoring, token
  counting, fingerprinting, multimodal binary-column plumbing.

Everything is DataFrame-API / Spark-SQL first; Python appears only inside
Arrow-batched pandas UDFs (never per-row).
"""

__version__ = "0.1.0"
