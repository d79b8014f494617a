from .pipeline_oracle import OracleResult, oracle_build  # noqa: F401
