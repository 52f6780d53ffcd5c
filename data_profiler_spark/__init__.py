"""data_profiler_spark — a from-scratch PySpark-native analytics engine.

Re-expresses the computational capabilities of the reference profiler
(``brentley/data-profiler``: exact per-column metrics, strict format
validation, keep/drop decisioning, candidate-key / duplicate analysis,
resumable run lifecycle) as idiomatic Spark DataFrame programs, re-targeted
at document-level web-text quality filtering over Common-Crawl-style pages.

The design stance (SURVEY.md §7.0): no profiler classes, no SQLite, no
per-row Python.  Pure DataFrame transform functions, aggregate-expression
builders, a thin driver orchestrator, and vectorized pandas/Arrow UDFs only
where a built-in cannot express the op (language-ID model inference,
perplexity scoring, UTF-8 byte-offset validation).
"""

__version__ = "0.1.0"
