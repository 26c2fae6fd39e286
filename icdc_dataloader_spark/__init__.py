"""icdc_dataloader_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine with the query and data-processing capabilities of CBIIT/icdc-dataloader.

The reference (/root/reference) is a row-at-a-time validate->upsert ETL loader
into Neo4j (one Cypher round-trip per row, data_loader.py:901-947). This engine
re-expresses the same semantics set-oriented on Spark:

- model-YAML-driven schema + validation  -> model.py, operators/validate.py
- type coercion quirks (data_loader.py:383-436) -> functions/coerce.py
- UUID5 identity (icdc_schema.py:119-128) -> functions/identity.py
- duplicate-ID / LWW dedup (data_loader.py:660-692) -> operators/dedup.py
- MERGE upsert/new/delete (data_loader.py:787-824,873-954) -> plans/merge.py
- snapshot lake table (replaces Neo4j; backup = time travel) -> plans/lake.py
- SQS-tail loop (file_loader.py:428-456) -> streaming/cdc.py + ledger.py
- relationship resolution (data_loader.py:965-1179) -> operators/relationships.py
- cascade delete (data_loader.py:826-870) -> operators/cascade.py

Everything is DataFrame-first: Catalyst handles pushdown/pruning/join choice;
pandas/Arrow UDFs only where bit-parity with the reference's Python semantics
is required.
"""

__version__ = "0.1.0"
