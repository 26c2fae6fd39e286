"""Storage plans: snapshot lake table (Iceberg-shaped, from scratch) and the
MERGE INTO planner that replaces the reference's per-row Cypher MERGE."""
