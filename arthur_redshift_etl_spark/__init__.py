"""arthur_redshift_etl_spark — a PySpark-native analytics/ELT engine.

A from-scratch engine with the query and data-processing capabilities of
harrystech/arthur-redshift-etl (the "reference"), re-expressed Spark-first:

- The reference's dataflow layer (relations, table designs, dependency DAG,
  blue-green publish, constraint verification) is implemented in plain Python
  over the Spark catalog (see ``relations``, ``design``, ``loader``).
- The reference's delegated SQL surface (Redshift executes user SQL) becomes
  ``spark.sql`` on Catalyst, with a Redshift-dialect compatibility shim
  (``functions.compat``).
- Sqoop parallel extraction becomes partition-aware ``spark.read.jdbc``
  (``sources.jdbc``); Redshift COPY/UNLOAD become DataFrame readers/writers
  with manifest sidecars (``sources.files``, ``sinks``).

Beyond reference parity, ``operators`` adds large-scale training-data-pipeline
primitives: dedup (exact/minhash/simhash/ngram), similarity search, text
analysis, and multimodal column plumbing.
"""

__version__ = "0.1.0"
