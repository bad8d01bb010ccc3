"""Driver-contract package: the queries()/oracle_sql() registry
split out of __spark_entry__.py (VERDICT r4 order #3).  Import
``oracles.registry`` for the contract; segment modules hold the
query callables and oracle SQL, grouped in contract order."""
