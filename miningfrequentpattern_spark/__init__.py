"""miningfrequentpattern_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference repo ``wj2021/MiningFrequentPattern``
(frequent itemset mining via MapReduce), extended with the
LLM-data-pipeline operators mandated by the build contract: exact and
near-duplicate detection, embedding similarity search, multimodal
column plumbing, text analysis, and structured streaming.

Design principles (SURVEY.md §2/§4):

- DataFrame/SQL everywhere; zero RDD code. Catalyst + Tungsten do the
  physical planning — no custom optimizer rules are needed because the
  reference's entire MapReduce surface (parallel counting, group
  sharding, combiners, broadcast of candidate sets) maps to built-in
  Spark machinery (partial aggregation, shuffle-by-key, broadcast
  joins, MLlib FP-Growth's internal PFP parallelization).
- UDFs are the slow path: every hot-path operator has a native
  `pyspark.sql.functions` formulation; Python appears only in
  Arrow-batched pandas UDFs for genuinely non-SQL logic (multimodal
  decode stubs, custom stateful streaming).
- Every operator is registered in `queries.registry` with a DuckDB
  oracle where SQL-expressible, which is the correctness gate.

NOTE ON CITATIONS: /root/reference is empty (verified — see
SURVEY.md §0), so no reference file:line citations exist anywhere in
this codebase; capability claims trace to SURVEY.md's provenance tags
(driver contract, public papers, PySpark API) instead.
"""

__version__ = "0.1.0"
