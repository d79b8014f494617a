"""graph_rag_agent_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the semantics of ss7lyb/graph-rag-agent.

The reference (read-only at /root/reference) is a single-process
Neo4j + LangChain system; this package re-expresses its construction
pipeline (chunk → extract → parse → entity-link → canonicalize →
communities → summaries → materialize) as DataFrame programs over
parquet/Iceberg-style tables of multi-turn transcripts:

    transcripts(conv_id, turn_idx, role, text, tool, ts)

Layout:
    core/       pure-Python semantics (no Spark imports) shared by the
                Arrow UDFs and the pytest oracle — transcribed, not
                copied, from the reference's behavior.
    sources/    table IO, synthetic transcript generation, checkpoints.
    functions/  column-level function library (hashing, text stats,
                vector math) — JVM-side pyspark.sql.functions only.
    operators/  the KG operators (chunking, extraction, parsing,
                linking, connected components, canonicalization,
                community detection, dedup, ANN).
    plans/      end-to-end pipeline orchestration with per-partition
                checkpoint + lineage + resume.
    oracle/     pure-Python end-to-end reference implementation used
                as the P/R gate in tests.
"""

__version__ = "0.1.0"
