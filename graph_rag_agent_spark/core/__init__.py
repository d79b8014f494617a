"""Pure-Python semantics core — NO pyspark imports here.

These functions define the exact behavior both sides share:
the Spark operators wrap them in Arrow-batched UDFs, and the pytest
oracle (graph_rag_agent_spark.oracle) composes them in plain Python.
Any divergence between pipeline and oracle is therefore a plumbing
bug, which is precisely what the P/R gate is meant to catch.
"""
